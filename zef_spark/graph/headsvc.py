"""Networked graph-sync transport: a minimal HEAD SERVICE plus a
remote `GraphStore` client, so writers on different hosts share
NOTHING but a URL.

Reference parity: zefhub/zef syncs graphs across processes/hosts via
ZefHub — a WebSocket broker with a transactor role
(`core/src/butler/butler_handlers_ws.cpp`; the robot suite
`python/tests/robot/tests/test.robot` drives 10 REPLs syncing one
graph over the network with no shared filesystem). This module is
the Spark-first analogue: instead of a stateful broker owning the
graph, the head service is a DUMB CONDITIONAL-PUT OBJECT STORE
(exactly the S3 `If-None-Match:*` / GCS `ifGenerationMatch=0`
contract), and all coordination stays in the client-side
`MarkerCommitProtocol` — the transactor role is decided per-tx by
whoever wins the conditional put, and "handoff" is automatic because
losing a claim is an ordinary retry against the refreshed head
(`graph/sync.py` commit loop). At 100 TB the same client code points
at real S3/GCS and Spark reads segment parquet straight from the
bucket; the HTTP service here exists so the protocol's full
read-resolution chain (marker-before-segment visibility, losing
claims, cross-host refresh) is PROVEN against a non-POSIX store with
eventual-visibility semantics (tests/test_headsvc.py).

Layout served (all keys relative to the store root):
    meta.json                     — store metadata (immutable)
    base/**                       — base snapshot parquet
    base-<tx>/**                  — compaction checkpoint bases
    txlog/seg-<uuid>/**           — segment parquet (immutable blobs)
    txlog/_commits/<tx>.json      — THE commit record: conditional-put
                                    marker carrying the segment name
                                    AND the segment's file manifest

The manifest closes the eventual-visibility race: a reader may list
the marker before the segment's blobs are visible (object stores
promise no cross-key ordering), so `_pull` downloads exactly the
manifest's files and defers the ENTIRE marker — and every later tx,
to keep the chain gapless — until all of them resolve.
"""

from __future__ import annotations

import json
import os
import threading
import urllib.error
import urllib.request
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from .sync import _SEG_FMT, GraphStore, MarkerCommitProtocol

# --------------------------------------------------------------- #
# the head service (server side)
# --------------------------------------------------------------- #


class _Store:
    """In-memory object store with optional eventual visibility:
    with ``eventual=True`` a PUT lands in staging and is invisible to
    GET/LIST until ``settle()`` — conditional PUT stays strongly
    consistent across staged+settled (the real S3/GCS contract:
    writes are atomic and conditional, reads/lists lag)."""

    def __init__(self, eventual: bool = False):
        self._settled: dict[str, bytes] = {}
        self._staged: dict[str, bytes] = {}
        self._eventual = eventual
        self._lock = threading.Lock()
        # push channel (r09 verdict order #5): /watch long-pollers
        # park on this condition; every SETTLED put wakes them —
        # the ZefHub-subscription-push analogue (reference:
        # core/include/observable.h:70-116 — the WebSocket broker
        # pushes graph updates to subscribed clients; here the dumb
        # object store only ever pushes "something landed", and all
        # interpretation stays client-side, keeping the store
        # S3/GCS-shaped: S3 Event Notifications carry keys, not
        # graph semantics)
        self._cond = threading.Condition(self._lock)

    def put(self, key: str, data: bytes, if_none_match: bool) -> bool:
        with self._lock:
            if if_none_match and (key in self._settled
                                  or key in self._staged):
                return False
            target = self._staged if self._eventual else self._settled
            target[key] = data
            if target is self._settled:
                self._cond.notify_all()
            return True

    def get(self, key: str) -> bytes | None:
        with self._lock:
            return self._settled.get(key)

    def list(self, prefix: str) -> list[str]:
        with self._lock:
            return sorted(k for k in self._settled if
                          k.startswith(prefix))

    def set_eventual(self, eventual: bool) -> None:
        """Flip visibility semantics mid-test (publish under strong
        visibility, then prove the refresh chain under lag)."""
        with self._lock:
            self._eventual = eventual

    def settle(self, prefix: str = "") -> int:
        """Promote staged objects (matching prefix) to visible."""
        with self._lock:
            keys = [k for k in self._staged if k.startswith(prefix)]
            for k in keys:
                self._settled[k] = self._staged.pop(k)
            if keys:
                self._cond.notify_all()
            return len(keys)

    def _commit_txs_above(self, since: int) -> list[int]:
        # caller holds self._lock (via self._cond)
        out = []
        pre = "txlog/_commits/"
        for k in self._settled:
            if k.startswith(pre) and k.endswith(".json"):
                name = k[len(pre):-5]
                if name.isdigit() and int(name) > since:
                    out.append(int(name))
        return sorted(out)

    def wait_for_tx(self, since: int, timeout: float) -> list[int]:
        """Block until a commit marker with tx > ``since`` is
        SETTLED (visible), up to ``timeout`` seconds; returns the
        new tx numbers ([] on timeout). The long-poll primitive —
        wakes on the put itself, no poll interval anywhere."""
        import time as _time
        deadline = _time.monotonic() + timeout
        with self._cond:
            while True:
                txs = self._commit_txs_above(since)
                if txs:
                    return txs
                remaining = deadline - _time.monotonic()
                if remaining <= 0:
                    return []
                self._cond.wait(remaining)


class _Handler(BaseHTTPRequestHandler):
    store: _Store  # set by serve()

    def log_message(self, *a):  # quiet
        pass

    def _send(self, code: int, body: bytes = b"",
              ctype: str = "application/octet-stream"):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_PUT(self):
        if not self.path.startswith("/obj/"):
            return self._send(404)
        key = self.path[len("/obj/"):]
        n = int(self.headers.get("Content-Length", 0))
        data = self.rfile.read(n)
        cond = self.headers.get("If-None-Match") == "*"
        if self.store.put(key, data, if_none_match=cond):
            self._send(201)
        else:
            self._send(412)  # Precondition Failed — claim lost

    def do_GET(self):
        if self.path.startswith("/obj/"):
            data = self.store.get(self.path[len("/obj/"):])
            if data is None:
                return self._send(404)
            return self._send(200, data)
        if self.path.startswith("/list/"):
            keys = self.store.list(self.path[len("/list/"):])
            return self._send(200, json.dumps(keys).encode(),
                              "application/json")
        if self.path.startswith("/watch"):
            from urllib.parse import parse_qs, urlparse
            qs = parse_qs(urlparse(self.path).query)
            since = int(qs.get("since", ["-1"])[0])
            timeout = min(float(qs.get("timeout", ["25"])[0]), 120.0)
            txs = self.store.wait_for_tx(since, timeout)
            if txs:
                return self._send(200, json.dumps(txs).encode(),
                                  "application/json")
            return self._send(204)  # timeout: client re-arms
        self._send(404)


def serve(host: str = "127.0.0.1", port: int = 0,
          eventual: bool = False):
    """Start a head service; returns (server, url, store). Run the
    server with ``threading.Thread(target=server.serve_forever,
    daemon=True).start()`` and stop it with ``server.shutdown()``."""
    store = _Store(eventual=eventual)
    handler = type("Handler", (_Handler,), {"store": store})
    srv = ThreadingHTTPServer((host, port), handler)
    url = f"http://{srv.server_address[0]}:{srv.server_address[1]}"
    return srv, url, store


# --------------------------------------------------------------- #
# client side
# --------------------------------------------------------------- #


class HttpObjectClient:
    """Tiny conditional-put object client. `put_if_absent` is the
    exact hook signature `MarkerCommitProtocol` binds for real
    object stores."""

    def __init__(self, url: str, timeout: float = 30.0):
        self.url = url.rstrip("/")
        self.timeout = timeout

    def put(self, key: str, data: bytes,
            if_none_match: bool = False) -> bool:
        req = urllib.request.Request(
            f"{self.url}/obj/{key}", data=data, method="PUT")
        if if_none_match:
            req.add_header("If-None-Match", "*")
        try:
            with urllib.request.urlopen(req, timeout=self.timeout):
                return True
        except urllib.error.HTTPError as e:
            if e.code == 412:
                return False
            raise

    def get(self, key: str) -> bytes | None:
        try:
            with urllib.request.urlopen(
                    f"{self.url}/obj/{key}",
                    timeout=self.timeout) as r:
                return r.read()
        except urllib.error.HTTPError as e:
            if e.code == 404:
                return None
            raise

    def list(self, prefix: str) -> list[str]:
        with urllib.request.urlopen(
                f"{self.url}/list/{prefix}",
                timeout=self.timeout) as r:
            return json.loads(r.read())

    def watch(self, since: int, timeout: float = 25.0) -> list[int]:
        """Long-poll for commit markers with tx > ``since``: the
        request PARKS server-side on the store's condition variable
        and returns the instant a marker settles — no poll interval.
        [] on server timeout (re-arm and call again)."""
        with urllib.request.urlopen(
                f"{self.url}/watch?since={int(since)}"
                f"&timeout={float(timeout)}",
                timeout=timeout + 10.0) as r:
            if r.status == 204:
                return []
            return json.loads(r.read())


def _walk_rel(root: str) -> list[str]:
    out = []
    for dirpath, _dirs, files in os.walk(root):
        for fn in files:
            p = os.path.join(dirpath, fn)
            out.append(os.path.relpath(p, root))
    return sorted(out)


def _parallel(fn, items, workers: int = 8) -> None:
    """Run fn(item) over items with a small thread pool — blob
    up/downloads are independent (immutable, uuid-named keys; the
    marker that makes them visible goes strictly LAST), so the
    transfer cost is bandwidth, not the per-file round-trip latency
    of the r09 sequential loop. Measured (tools/write_bench.py,
    local loopback): a 1M-row mapped commit through the head
    service costs ~1 s over the local-disk path (7.3 vs 6.3 s) —
    against a real object store the per-PUT latency is ~ms, which
    the pool pipelines instead of summing. First exception
    propagates; remaining transfers finish or fail irrelevantly
    (the marker is never written on failure)."""
    if len(items) <= 1:
        for it in items:
            fn(it)
        return
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(max_workers=min(workers,
                                            len(items))) as ex:
        for _ in ex.map(fn, items):
            pass


class _RemoteMarkerProtocol(MarkerCommitProtocol):
    """Claim a tx on the HEAD SERVICE: upload the (immutable,
    uuid-named) segment blobs first, then conditional-put the marker
    carrying the file manifest. A lost claim leaves the uploaded
    blobs as invisible garbage — the object-store posture; nothing
    ever renames."""

    def __init__(self, client: HttpObjectClient, cache_root: str):
        self.client = client
        self.cache_root = cache_root
        super().__init__()

    def claim(self, path: str, tx: int, seg_tmp: str) -> bool:
        seg = os.path.basename(seg_tmp)
        files = _walk_rel(seg_tmp)

        def _up(rel: str) -> None:
            with open(os.path.join(seg_tmp, rel), "rb") as f:
                self.client.put(f"txlog/{seg}/{rel}", f.read())

        _parallel(_up, files)
        # a compaction segment references a base-<tx> snapshot dir
        # OUTSIDE the segment — ship it and manifest it root-relative
        extra: list[str] = []
        ck = os.path.join(seg_tmp, "checkpoint.json")
        if os.path.exists(ck):
            with open(ck) as f:
                base_name = json.load(f)["base"]
            base_dir = os.path.join(self.cache_root, base_name)
            rels = _walk_rel(base_dir)

            def _up_base(rel: str) -> None:
                with open(os.path.join(base_dir, rel), "rb") as f:
                    self.client.put(f"{base_name}/{rel}", f.read())

            _parallel(_up_base, rels)
            extra = [f"{base_name}/{rel}" for rel in rels]
        marker = json.dumps({"segment": seg, "files": files,
                             "extra": extra})
        key = "txlog/_commits/" + _SEG_FMT.format(tx) + ".json"
        if not self.client.put(key, marker.encode(),
                               if_none_match=True):
            return False
        # mirror the marker into the local cache so the local
        # _seg_dirs chain resolves without a network round-trip
        cdir = os.path.join(path, "txlog", "_commits")
        os.makedirs(cdir, exist_ok=True)
        with open(os.path.join(
                cdir, _SEG_FMT.format(tx) + ".json"), "w") as f:
            f.write(marker)
        return True


class RemoteGraphStore(GraphStore):
    """A `GraphStore` whose durable home is a head-service URL; the
    local ``cache_dir`` is a private, disposable mirror (each process
    has its OWN — processes share only the URL). Reads pull unseen
    committed segments into the cache; writes build the segment
    locally, upload, and win the tx by remote conditional put."""

    def __init__(self, spark, url: str, cache_dir: str):
        self.client = HttpObjectClient(url)
        os.makedirs(os.path.join(cache_dir, "txlog", "_commits"),
                    exist_ok=True)
        super().__init__(spark, cache_dir,
                         protocol=_RemoteMarkerProtocol(
                             self.client, cache_dir))
        self._pull_static()

    # -- publishing / attaching -----------------------------------

    @classmethod
    def publish(cls, g, url: str, cache_dir: str) -> "RemoteGraphStore":
        """Materialize ``g`` into the cache, upload base+meta, open."""
        local = GraphStore.init(g, cache_dir)
        client = HttpObjectClient(url)

        def _up(rel: str) -> None:
            with open(os.path.join(cache_dir, "base", rel),
                      "rb") as f:
                client.put(f"base/{rel}", f.read())

        _parallel(_up, _walk_rel(os.path.join(cache_dir, "base")))
        with open(os.path.join(cache_dir, "meta.json"), "rb") as f:
            client.put("meta.json", f.read())
        del local
        return cls(g.spark, url, cache_dir)

    def _pull_static(self):
        """Fetch meta + base into the cache if absent (attach path)."""
        meta_p = os.path.join(self.path, "meta.json")
        if not os.path.exists(meta_p):
            data = self.client.get("meta.json")
            if data is None:
                raise FileNotFoundError(
                    "no graph published at this head service "
                    "(meta.json missing) — publish() first")
            with open(meta_p, "wb") as f:
                f.write(data)
        if not os.path.isdir(os.path.join(self.path, "base")):
            _parallel(self._download, self.client.list("base/"))

    def _download(self, key: str):
        dst = os.path.join(self.path, key)
        os.makedirs(os.path.dirname(dst), exist_ok=True)
        data = self.client.get(key)
        if data is None:
            raise FileNotFoundError(key)
        tmp = dst + ".part"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, dst)

    # -- read side --------------------------------------------------

    def _pull(self):
        """Mirror remotely-committed segments into the cache, IN TX
        ORDER, stopping at the first marker whose manifest isn't
        fully visible yet (no cross-key ordering on object stores:
        the marker can list before its blobs GET — resolving tx N+1
        while N is still materializing would corrupt the chain)."""
        cdir = os.path.join(self.path, "txlog", "_commits")
        have = {n for n in os.listdir(cdir)} if os.path.isdir(cdir) \
            else set()
        # tx numbers are claimed DENSELY (every commit/compact takes
        # max_tx+1), so the marker sequence itself must be gapless:
        # if marker N is not yet listed while N+1 is (eventual LIST
        # lag has no cross-key ordering), applying N+1 would leapfrog
        # a committed tx. Track the expected next tx and stop at the
        # first hole.
        with open(os.path.join(self.path, "meta.json")) as f:
            expected = json.load(f)["base_max_tx"] + 1
        for n in have:
            if n.endswith(".json") and n[:-5].isdigit():
                expected = max(expected, int(n[:-5]) + 1)
        remote = self.client.list("txlog/_commits/")
        for key in remote:  # sorted → tx order (zero-padded names)
            name = key.rsplit("/", 1)[-1]
            if name in have:
                continue
            if int(name[:-5]) > expected:
                break  # marker gap: an earlier tx is still dark
            expected = int(name[:-5]) + 1
            raw = self.client.get(key)
            if raw is None:
                break  # listed-but-not-readable: settle later
            m = json.loads(raw)
            seg = m["segment"]
            need = [f"txlog/{seg}/{rel}" for rel in m.get("files", [])
                    if not os.path.exists(
                        os.path.join(self.path, "txlog", seg, rel))]
            need += [k2 for k2 in m.get("extra", [])
                     if not os.path.exists(
                         os.path.join(self.path, k2))]
            try:
                _parallel(self._download, need)
            except FileNotFoundError:
                break  # blobs not visible yet — stop the chain HERE
            os.makedirs(cdir, exist_ok=True)
            tmp = os.path.join(cdir, name + ".part")
            with open(tmp, "w") as f:
                f.write(raw.decode())
            os.replace(tmp, os.path.join(cdir, name))

    def refresh(self):
        self._pull()
        return super().refresh()

    head = refresh

    # -- push subscriptions (r09 verdict order #5) -------------------

    def subscribe(self, fn, event: str | None = None, token=None,
                  poll_timeout: float = 25.0) -> "_Subscription":
        """Fire ``fn`` when ANOTHER process commits — push-based:
        the background thread parks in the head service's /watch
        long-poll (server-side condition variable, woken by the
        marker put itself), so notification latency is one HTTP
        round-trip, not a poll interval. The ZefHub subscription-push
        analogue (reference: core/include/observable.h:70-116,
        butler_handlers_ws.cpp — the broker pushes updates to
        subscribed clients; here the client parks and the dumb store
        wakes it, which keeps the service S3-shaped).

        Without ``event``: fn(graph, applied_txs) on every batch of
        remote commits. With ``event`` ('instantiated' /
        'terminated' / 'assigned') and optional ``token``: the
        `on[...]` form — fn(events_df) receives the derived event
        log filtered to the newly applied txs and the event/token,
        mirroring `g | on['instantiated', ET.X]`.

        Returns a handle; call .stop() to end the subscription."""
        self.refresh()
        start_seg = self._head_seg
        stop = threading.Event()

        def _loop():
            import time as _time
            since = start_seg
            while not stop.is_set():
                try:
                    txs = self.client.watch(since, poll_timeout)
                except Exception:
                    if stop.is_set():
                        return
                    _time.sleep(0.2)
                    continue
                if stop.is_set():
                    return
                if not txs:
                    continue
                g = self.refresh()
                applied = [t for t in txs if t <= self._head_seg]
                if not applied:
                    # markers visible but blobs still dark
                    # (eventual visibility) — back off, re-arm
                    _time.sleep(0.1)
                    continue
                since = max(applied)
                try:
                    if event is None:
                        fn(g, applied)
                    else:
                        from pyspark.sql import functions as F
                        from ..streaming.events import (
                            derive_event_log, on_assigned,
                            on_instantiated, on_terminated)
                        log = derive_event_log(g).where(
                            F.col("tx_id").isin(applied))
                        pick = {"instantiated": on_instantiated,
                                "terminated": on_terminated,
                                "assigned": on_assigned}[event]
                        fn(pick(log, token))
                except Exception:  # subscriber errors never kill
                    pass           # the watch loop

        t = threading.Thread(target=_loop, daemon=True)
        t.start()
        return _Subscription(t, stop)


class _Subscription:
    """Handle for a RemoteGraphStore.subscribe loop."""

    def __init__(self, thread: threading.Thread,
                 stop: threading.Event):
        self._thread = thread
        self._stop = stop

    def stop(self, timeout: float = 5.0) -> None:
        self._stop.set()
        self._thread.join(timeout=timeout)

    @property
    def alive(self) -> bool:
        return self._thread.is_alive()
