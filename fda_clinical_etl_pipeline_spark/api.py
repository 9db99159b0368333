"""Provenance/lineage REST API façade (SURVEY.md §2.12; api/app.py:57-152).

The reference serves 5 read endpoints + health over FastAPI, each a
Postgres point query. Here each endpoint is a pure handler over the
``ProvenanceStore`` DataFrame queries — framework-independent and
testable without a socket. A FastAPI app is built when fastapi is
importable (production path); otherwise ``serve_stdlib`` exposes the same
routes on http.server for environments without web frameworks (this one).

Scale note: the handlers are point lookups / top-k over the provenance
tables; at scale those tables would be partitioned (or Z-ordered) by
``batch_id`` and ``source_name`` so each endpoint touches one partition
(SURVEY.md §3.2).
"""

from __future__ import annotations

import json
from typing import Any

from .plans.provenance import ProvenanceStore


def _rows(df) -> list[dict[str, Any]]:
    return [
        {k: (str(v) if hasattr(v, "isoformat") else v) for k, v in r.asDict().items()}
        for r in df.collect()
    ]


class LineageApi:
    """GET /provenance/batch/{id} | /steps/{id} | /rules/{id} |
    /latest?n= | /search?status=&source_name= | /health"""

    def __init__(self, store: ProvenanceStore):
        self.store = store

    def health(self) -> dict:
        return {"status": "ok"}

    def batch(self, batch_id: str) -> dict | None:
        """api/app.py:63-89 — point lookup by PK. Column-API predicate:
        externally supplied ids never touch SQL text (no quoting/escaping
        surface at all)."""
        from pyspark.sql import functions as F

        rows = _rows(
            self.store.batches().filter(F.col("batch_id") == F.lit(batch_id))
        )
        return rows[0] if rows else None

    def steps(self, batch_id: str) -> list[dict]:
        """api/app.py:93-102 — timeline, ordered by step_time."""
        return _rows(self.store.steps(batch_id))

    def rules(self, batch_id: str) -> list[dict]:
        """api/app.py:106-118 — PHI rules applied to the batch."""
        return _rows(self.store.rules_applied(batch_id))

    def latest(self, n: int = 20) -> list[dict]:
        """api/app.py:122-132 — latest n batches per source (W2)."""
        return _rows(self.store.latest_per_source(n))

    def search(self, status: str | None = None,
               source_name: str | None = None) -> list[dict]:
        """api/app.py:136-152 — dynamic conjunctive predicates (P7)."""
        return _rows(self.store.search(status, source_name))


def build_fastapi(store: ProvenanceStore):
    """Production path: a FastAPI app when the dependency exists."""
    try:
        from fastapi import FastAPI, HTTPException
    except ImportError as exc:  # pragma: no cover - env without fastapi
        raise ImportError(
            "fastapi not installed; use LineageApi directly or serve_stdlib"
        ) from exc

    api = LineageApi(store)
    app = FastAPI(title="provenance-lineage")

    @app.get("/health")
    def health():
        return api.health()

    @app.get("/provenance/batch/{batch_id}")
    def batch(batch_id: str):
        row = api.batch(batch_id)
        if row is None:
            raise HTTPException(404, "batch not found")
        return row

    @app.get("/provenance/steps/{batch_id}")
    def steps(batch_id: str):
        return api.steps(batch_id)

    @app.get("/provenance/rules/{batch_id}")
    def rules(batch_id: str):
        return api.rules(batch_id)

    @app.get("/provenance/latest")
    def latest(n: int = 20):
        return api.latest(n)

    @app.get("/provenance/search")
    def search(status: str | None = None, source_name: str | None = None):
        return api.search(status, source_name)

    return app


def serve_stdlib(store: ProvenanceStore, port: int = 8000):
    """Zero-dependency fallback: the same routes on http.server.
    Returns the server object (caller controls the serve loop)."""
    import http.server
    import urllib.parse

    api = LineageApi(store)

    class Handler(http.server.BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def do_GET(self):
            parsed = urllib.parse.urlparse(self.path)
            parts = [p for p in parsed.path.split("/") if p]
            qs = dict(urllib.parse.parse_qsl(parsed.query))
            try:
                if parts == ["health"]:
                    body, code = api.health(), 200
                elif parts[:2] == ["provenance", "batch"] and len(parts) == 3:
                    body = api.batch(parts[2])
                    code = 200 if body is not None else 404
                    body = body or {"error": "batch not found"}
                elif parts[:2] == ["provenance", "steps"] and len(parts) == 3:
                    body, code = api.steps(parts[2]), 200
                elif parts[:2] == ["provenance", "rules"] and len(parts) == 3:
                    body, code = api.rules(parts[2]), 200
                elif parts == ["provenance", "latest"]:
                    body, code = api.latest(int(qs.get("n", "20"))), 200
                elif parts == ["provenance", "search"]:
                    body, code = api.search(
                        qs.get("status"), qs.get("source_name")
                    ), 200
                else:
                    body, code = {"error": "not found"}, 404
            except Exception as exc:  # pragma: no cover
                body, code = {"error": str(exc)}, 500
            data = json.dumps(body).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(data)))
            self.end_headers()
            self.wfile.write(data)

    return http.server.ThreadingHTTPServer(("127.0.0.1", port), Handler)
