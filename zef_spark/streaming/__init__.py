from .events import (EventLog, events_of_tx, on_assigned,  # noqa: F401
                     on_instantiated, on_terminated, preceding_events,
                     sessionized, streaming_dedup, subscribe,
                     windowed_counts)
from .joins import stream_interval_join  # noqa: F401
from .stateful import (run_segments_once,  # noqa: F401
                       split_on_next_stream)
