from .events import (EventLog, events_of_tx, on_assigned,  # noqa: F401
                     on_instantiated, on_terminated, subscribe)
