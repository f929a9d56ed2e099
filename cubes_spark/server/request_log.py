"""Server request logging.

Parity: /root/reference/cubes/server/logging.py:70-160 —
``RequestLogger.log_time`` context manager around browse calls,
pluggable handlers (python-logging default, JSON-lines file), and an
asynchronous queue-backed variant so logging I/O never sits on the
request path.
"""

from __future__ import annotations

import datetime
import json
import logging
import time
from contextlib import contextmanager
from typing import Any, List, Optional

__all__ = [
    "RequestLogger",
    "AsyncRequestLogger",
    "RequestLogHandler",
    "DefaultRequestLogHandler",
    "JSONLRequestLogHandler",
    "configured_request_logger",
]


class RequestLogHandler:
    def write_record(self, record: dict) -> None:
        raise NotImplementedError


class DefaultRequestLogHandler(RequestLogHandler):
    """Python-logging INFO lines (parity: logging.py:140-160)."""

    def __init__(self, logger: Optional[logging.Logger] = None,
                 **options: Any) -> None:
        self.logger = logger or logging.getLogger("cubes_spark.server")

    def write_record(self, record: dict) -> None:
        self.logger.info(
            "method:%s cube:%s cell:%s identity:%s time:%s",
            record.get("method"), record.get("cube"),
            record.get("cell") or "none",
            record.get("identity") or "none",
            record.get("elapsed_time"),
        )


class JSONLRequestLogHandler(RequestLogHandler):
    """One JSON document per request, appended to a file (the
    reference's sql/csv store handlers re-expressed as the
    lowest-dependency durable format)."""

    def __init__(self, path: str, **options: Any) -> None:
        self.path = path

    def write_record(self, record: dict) -> None:
        with open(self.path, "a", encoding="utf-8") as f:
            f.write(json.dumps(record) + "\n")


class RequestLogger:
    """Times browse calls and fans records out to handlers
    (parity: logging.py:70-121).  Handler errors are logged, never
    raised — a broken log sink must not fail user queries."""

    def __init__(self,
                 handlers: Optional[List[RequestLogHandler]] = None) -> None:
        self.handlers = list(handlers or [])
        self.logger = logging.getLogger("cubes_spark.server")

    @contextmanager
    def log_time(self, method: str, cube: Any, cell: Any = None,
                 identity: Any = None, **other: Any):
        start = time.perf_counter()
        yield
        elapsed = time.perf_counter() - start
        self.log(method, cube, cell, identity=identity,
                 elapsed=elapsed, **other)

    def log(self, method: str, cube: Any, cell: Any = None,
            identity: Any = None, elapsed: Optional[float] = None,
            **other: Any) -> None:
        record = {
            "timestamp": datetime.datetime.now(
                datetime.timezone.utc).isoformat(),
            "method": method,
            "cube": str(cube) if cube is not None else None,
            "cell": str(cell) if cell else None,
            "identity": identity,
            "elapsed_time": round(elapsed or 0.0, 6),
        }
        for key, value in other.items():
            record[key] = str(value) if value is not None else None
        for handler in self.handlers:
            try:
                handler.write_record(record)
            except Exception as exc:
                self.logger.error(
                    "Server log handler error (%s): %s",
                    type(handler).__name__, exc,
                )


class AsyncRequestLogger(RequestLogger):
    """Queue-backed: ``log`` enqueues and returns; a daemon thread
    drains (parity: logging.py:123-138)."""

    def __init__(self,
                 handlers: Optional[List[RequestLogHandler]] = None) -> None:
        super().__init__(handlers)
        import queue
        import threading

        self.queue: "queue.Queue" = queue.Queue()
        thread = threading.Thread(target=self._consume,
                                  name="slicer_logging", daemon=True)
        thread.start()

    def log(self, *args: Any, **kwargs: Any) -> None:
        self.queue.put((args, kwargs))

    def _consume(self) -> None:
        while True:
            args, kwargs = self.queue.get()
            super().log(*args, **kwargs)


_HANDLER_TYPES = {
    "default": DefaultRequestLogHandler,
    "jsonl": JSONLRequestLogHandler,
}


def configured_request_logger(config: Any) -> Optional[RequestLogger]:
    """Build a logger from config: ``{"handlers": [{"type": "default"}
    , {"type": "jsonl", "path": "..."}], "async": true}`` (parity:
    logging.py:49-68 configured_request_log_handlers)."""
    if not config:
        return None
    handlers = []
    for hconf in config.get("handlers") or [{"type": "default"}]:
        hconf = dict(hconf)
        htype = hconf.pop("type", "default")
        try:
            cls = _HANDLER_TYPES[htype]
        except KeyError:
            raise ValueError(f"Unknown request log handler '{htype}'")
        handlers.append(cls(**hconf))
    cls = AsyncRequestLogger if config.get("async") else RequestLogger
    return cls(handlers)
