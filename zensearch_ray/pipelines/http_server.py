"""HTTP serving front: ``GET /search?q=`` over the warm actor-pool
``QueryService`` — the reference's user-facing surface
(``express-server/src/app/index.ts:175-203`` routes ``/search`` with a
query param and returns ranked JSON results;
``express-server/src/index.ts:43-93`` wires the server to the search
backend). Here the backend is the already-warm replica pool, so the
HTTP layer is a thin stdlib ``ThreadingHTTPServer`` — no third-party
web framework, and results are bit-identical to ``QueryEngine.topk*``
because every request flows through the same ``_EngineReplica.search``
dispatch the stdin ``serve`` loop uses.

Endpoints:
  GET /search?q=...&k=10&mode=pruned&docs=1&filter=col=value
      → {"query", "mode", "k", "results"} — ``docs=1`` resolves
        url/title rows (the reference's response shape), ``docs=0``
        returns raw (doc_id, score) pairs.
  GET /facets?q=...&col=lang → {"query", "col", "facets"}
  GET /complete?prefix=...&k=10 → {"prefix", "completions"}
  GET /suggest?q=... → {"query", "suggestions"} — per-token
      did-you-mean (``QueryEngine.suggest``: best dictionary term at
      byte-Levenshtein ≤ 1, exact spelling wins, ties df DESC)
  GET /explain?q=...&k=10[&doc=ID] → {"query", "k", "explain"} — the
      Lucene-Explanation surface: per-term BM25 breakdown rows
      (``QueryEngine.explain``) for the top-k docs or one given doc.
  GET /stats → manifest core numbers + replica count + the live-reload
      version token (changes when an append/compact commits a new
      generation — what a dashboard polls).
  GET /healthz → {"ok": true, "replicas": N}
  GET /vsearch?vec=f1,f2,...&k=10&nprobe=4  (requires a
      ``vector_index_dir``) → ANN top-k over the warm ``VectorService``
      replicas; POST /vsearch with body {"vec": [...], "k", "nprobe"}
      is the same for high-dimensional probes that outgrow a URL.

Scale note: one driver-side HTTP process round-robins over N warm
replica actors (each ``num_cpus=1``); on a cluster you run one such
front per serving node — the replicas are location-transparent Ray
actors, so fronts share the pool.
"""

from __future__ import annotations

import json
import math
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

_MODES = (
    "exhaustive", "pruned", "and", "phrase", "near", "seq", "prefix",
    "fuzzy", "fuzzy2", "not", "bool", "wildcard", "regex", "boosted", "msm",
    "dismax", "fvf", "bmw",
)


def _jsonable(x):
    """numpy scalars / tuples → plain JSON types."""
    if isinstance(x, dict):
        return {k: _jsonable(v) for k, v in x.items()}
    if isinstance(x, (list, tuple)):
        return [_jsonable(v) for v in x]
    item = getattr(x, "item", None)
    return item() if callable(item) else x


class SearchHTTPServer:
    """Own the service + server pair; use as a context manager.

    ``port=0`` binds an ephemeral port (exposed as ``.port``) — the
    test-friendly default. ``serve_forever`` runs on a daemon thread so
    the caller (CLI or test) keeps control.
    """

    def __init__(self, index_dir: str, host: str = "127.0.0.1",
                 port: int = 0, replicas: int = 2, k: int = 10,
                 mode: str = "pruned", reload_secs: float | None = None,
                 vector_index_dir: str | None = None):
        from zensearch_ray.pipelines.service import QueryService

        self.service = QueryService(
            index_dir, replicas=replicas, k=k, mode=mode,
            reload_secs=reload_secs,
        )
        self.vservice = None
        if vector_index_dir is not None:
            from zensearch_ray.pipelines.vector import VectorService

            self.vservice = VectorService(
                vector_index_dir, replicas=replicas, k=k)
        svc = self.service
        vsvc = self.vservice
        default_k, default_mode = k, mode

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *args):  # quiet: tests/CLI own stdout
                pass

            def _reply(self, code: int, payload: dict) -> None:
                body = json.dumps(payload).encode()
                self.send_response(code)
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):  # noqa: N802  (stdlib handler contract)
                url = urlparse(self.path)
                qs = {k: v[0] for k, v in parse_qs(url.query).items()}
                try:
                    if url.path == "/healthz":
                        self._reply(200, {
                            "ok": True,
                            "replicas": len(svc._replicas),
                        })
                    elif url.path == "/search":
                        self._search(qs)
                    elif url.path == "/facets":
                        self._facets(qs)
                    elif url.path == "/complete":
                        self._complete(qs)
                    elif url.path == "/suggest":
                        self._suggest(qs)
                    elif url.path == "/explain":
                        self._explain(qs)
                    elif url.path == "/stats":
                        self._stats()
                    elif url.path == "/events":
                        self._events(qs)
                    elif url.path == "/vsearch":
                        if "vec" not in qs:
                            raise ValueError("missing required param vec")
                        self._vsearch(
                            [float(x) for x in qs["vec"].split(",")], qs)
                    else:
                        self._reply(404, {"error": f"no route {url.path}"})
                except (ValueError, KeyError) as exc:
                    self._reply(400, {"error": str(exc)})

            def do_POST(self):  # noqa: N802  (stdlib handler contract)
                url = urlparse(self.path)
                try:
                    if url.path != "/vsearch":
                        self._reply(404, {"error": f"no route {url.path}"})
                        return
                    n = int(self.headers.get("Content-Length", "0"))
                    body = json.loads(self.rfile.read(n) or b"{}")
                    vec = body.get("vec")
                    if not isinstance(vec, list) or not vec:
                        raise ValueError("body must carry a non-empty vec")
                    self._vsearch([float(x) for x in vec], body)
                except (ValueError, KeyError) as exc:
                    self._reply(400, {"error": str(exc)})

            def _vsearch(self, vec: list, params: dict) -> None:
                if vsvc is None:
                    raise ValueError(
                        "no vector index attached (serve --vector-index)")
                k = int(params.get("k", default_k))
                nprobe = int(params.get("nprobe", 4))
                ids, sims = vsvc.search(vec, k=k, nprobe=nprobe)
                self._reply(200, {
                    "k": k, "nprobe": nprobe,
                    "results": [
                        {"rank": i + 1, "vec_id": int(d), "sim": float(s)}
                        for i, (d, s) in enumerate(zip(ids, sims))
                    ],
                })

            def _search(self, qs: dict) -> None:
                q = qs.get("q", "").strip()
                if not q:
                    raise ValueError("missing required param q")
                mode = qs.get("mode", default_mode)
                if mode not in _MODES:
                    raise ValueError(
                        f"unknown mode {mode!r}; one of {_MODES}"
                    )
                k = int(qs.get("k", default_k))
                docs = qs.get("docs", "1") not in ("0", "false", "no")
                filt = None
                if "filter" in qs:
                    col, _, value = qs["filter"].partition("=")
                    if not value:
                        raise ValueError("filter expects col=value")
                    filt = (col, value)
                    mode = "exhaustive"  # filter serves exhaustive only
                rescore = qs.get("rescore") or None
                if rescore is not None:
                    mode = "exhaustive"  # phase 1 is the exhaustive union
                results = svc.search(
                    q, k=k, mode=mode, docs=docs, filter=filt,
                    rescore=rescore,
                )
                reply = {
                    "query": q, "mode": mode, "k": k,
                    "results": _jsonable(results),
                }
                if rescore is not None:
                    reply["rescore"] = rescore
                self._reply(200, reply)

            def _complete(self, qs: dict) -> None:
                prefix = qs.get("prefix", "").strip()
                if not prefix:
                    raise ValueError("missing required param prefix")
                k = int(qs.get("k", default_k))
                self._reply(200, {
                    "prefix": prefix,
                    "completions": [
                        {"term": t, "df": df}
                        for t, df in svc.complete(prefix, k)
                    ],
                })

            def _suggest(self, qs: dict) -> None:
                q = qs.get("q", "").strip()
                if not q:
                    raise ValueError("missing required param q")
                self._reply(200, {
                    "query": q,
                    "suggestions": [
                        {"token": t, "suggestion": s, "df": df}
                        for t, s, df in svc.suggest(q)
                    ],
                })

            def _stats_payload(self) -> dict:
                from zensearch_ray.pipelines.alias import resolve_if_alias
                from zensearch_ray.state.manifest import IndexLayout

                layout = IndexLayout(resolve_if_alias(index_dir))
                m = layout.read_manifest() or {}
                return {
                    "replicas": len(svc._replicas),
                    "version_token": layout.version_token(),
                    "n_docs": m.get("n_docs"),
                    "n_generations": m.get("n_generations"),
                    "n_partitions": m.get("n_partitions"),
                    "total_postings": m.get("total_postings"),
                    "total_posting_bytes": m.get("total_posting_bytes"),
                    "avgdl": m.get("avgdl"),
                    "positions": m.get("positions"),
                }

            def _stats(self) -> None:
                self._reply(200, self._stats_payload())

            def _events(self, qs: dict) -> None:
                """Server-Sent-Events push: one ``stats`` event
                immediately, then one whenever the index VERSION TOKEN
                changes (append / compact / alias swap commits) with
                keep-alive comments in between — the batch engine's
                push-progress channel (reference analog: the WebSocket
                the express front pushes crawl/index progress over,
                ``express-server/src/index.ts:43-93``, W2/W3; SSE is
                the stdlib-clean equivalent — same server-push
                semantics, plain HTTP). ``poll`` = token check period
                (s), ``max_events`` stops after N pushes (0 = stream
                until the client disconnects)."""
                import time as _time

                poll = float(qs.get("poll", "0.5"))
                if not math.isfinite(poll) or poll < 0:
                    raise ValueError("poll must be a finite value >= 0")
                # floor: poll=0 would busy-spin a server thread per
                # client hammering read_manifest/version_token
                poll = max(poll, 0.05)
                limit = int(qs.get("max_events", "0"))
                self.send_response(200)
                self.send_header("Content-Type", "text/event-stream")
                self.send_header("Cache-Control", "no-cache")
                self.end_headers()
                last = None
                sent = 0
                try:
                    while True:
                        payload = self._stats_payload()
                        tok = payload["version_token"]
                        if tok != last:
                            self.wfile.write(
                                b"event: stats\ndata: "
                                + json.dumps(_jsonable(payload)).encode()
                                + b"\n\n"
                            )
                            self.wfile.flush()
                            last = tok
                            sent += 1
                            if limit and sent >= limit:
                                return
                        else:
                            self.wfile.write(b": keep-alive\n\n")
                            self.wfile.flush()
                        _time.sleep(poll)
                except (BrokenPipeError, ConnectionResetError):
                    return  # client went away — normal SSE teardown

            def _explain(self, qs: dict) -> None:
                q = qs.get("q", "").strip()
                if not q:
                    raise ValueError("missing required param q")
                k = int(qs.get("k", default_k))
                doc = int(qs["doc"]) if "doc" in qs else None
                self._reply(200, {
                    "query": q, "k": k,
                    "explain": _jsonable(svc.explain(q, k=k, doc_id=doc)),
                })

            def _facets(self, qs: dict) -> None:
                q = qs.get("q", "").strip()
                col = qs.get("col", "").strip()
                if not q or not col:
                    raise ValueError("params q and col are required")
                self._reply(200, {
                    "query": q, "col": col,
                    "facets": _jsonable(svc.facet_counts(q, col)),
                })

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self.host = host
        self._thread: threading.Thread | None = None

    def start(self) -> "SearchHTTPServer":
        self._thread = threading.Thread(
            target=self.httpd.serve_forever, daemon=True
        )
        self._thread.start()
        return self

    def serve_forever(self) -> None:
        """Foreground form for the CLI."""
        self.httpd.serve_forever()

    def shutdown(self) -> None:
        self.httpd.shutdown()
        self.httpd.server_close()
        if self._thread is not None:
            self._thread.join(timeout=5)
        self.service.shutdown()
        if self.vservice is not None:
            self.vservice.shutdown()

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.shutdown()
        return False
