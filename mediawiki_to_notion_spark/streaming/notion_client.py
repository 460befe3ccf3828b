"""Rate-limited, retrying Notion-sink client (mockable).

Mirrors the reference's HTTP discipline (upload_notion_blocks.py:157-184):
- retry only on HTTP status 429/502/503/504
- at most 5 status-retries with exponential backoff (factor 0.2)
- connect/read errors are NOT retried
- client memoized per executor (module global, :51,157-161)

The transport is injected and must be picklable so the same object rides
into Spark workers; tests use :class:`ScriptedTransport` to inject
429/5xx/connect-error sequences (FIXTURES A7).
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

RETRYABLE_STATUSES = (429, 502, 503, 504)
MAX_STATUS_RETRIES = 5
BACKOFF_FACTOR = 0.2


class TransportError(Exception):
    """Connect/read-level failure — never retried (Retry(total=None,
    connect=0) in the reference)."""


class WorkerCrash(BaseException):
    """Stand-in for upload-worker *process* death (Lambda crash/timeout —
    the ``States.TaskFailed`` catch in upload-state-machine.asl.json:
    203-211).  Deliberately a BaseException so the per-row error handling
    in the upload sink (which models per-block API failures) can never
    swallow it: it kills the Spark task, the job fails, and the driver's
    abort path marks the affected pages ABORTED."""


class HTTPStatusError(Exception):
    def __init__(self, status: int) -> None:
        super().__init__(f"HTTP {status}")
        self.status = status


@dataclass
class ScriptedTransport:
    """Deterministic fake Notion API.

    ``script`` maps an operation key (e.g. ``"block:<batch>:<idx>"`` or
    ``"page:<batch>"``) to a list of HTTP statuses to emit on successive
    calls; missing keys succeed immediately.  0 means connect-error."""

    script: dict[str, list[int]] = field(default_factory=dict)
    calls: dict[str, int] = field(default_factory=dict)
    sleep: bool = False

    def request(self, op_key: str, payload: dict | None = None) -> dict:
        n = self.calls.get(op_key, 0)
        self.calls[op_key] = n + 1
        statuses = self.script.get(op_key, [])
        status = statuses[n] if n < len(statuses) else 200
        if status == -1:
            raise WorkerCrash(f"worker died at {op_key}")
        if status == 0:
            raise TransportError(f"connect error for {op_key}")
        if status != 200:
            raise HTTPStatusError(status)
        return {"ok": True, "url": f"https://notion.example/{op_key}"}


@dataclass
class RateLimiter:
    """Token-bucket pacer — the reference achieves API politeness with a
    1-wide distributed semaphore (upload-state-machine.asl.json:5-68);
    a single sink partition + this pacer gives the same guarantee."""

    min_interval_s: float = 0.0
    _last: float = field(default=0.0, repr=False)

    def wait(self) -> None:
        if self.min_interval_s <= 0:
            return
        now = time.monotonic()
        delta = now - self._last
        if delta < self.min_interval_s:
            time.sleep(self.min_interval_s - delta)
        self._last = time.monotonic()


class NotionClient:
    """Retrying wrapper over a transport."""

    def __init__(self, transport, rate_limiter: RateLimiter | None = None) -> None:
        self.transport = transport
        self.rate = rate_limiter or RateLimiter()

    def _call(self, op_key: str, payload: dict | None = None) -> dict:
        # transports that embed the reference's urllib3 Retry do their own
        # status retries — applying this loop on top would square the
        # retry count (36 attempts instead of 6)
        if getattr(self.transport, "handles_retries", False):
            self.rate.wait()
            return self.transport.request(op_key, payload)
        attempts = 0
        while True:
            self.rate.wait()
            try:
                return self.transport.request(op_key, payload)
            except HTTPStatusError as exc:
                if exc.status not in RETRYABLE_STATUSES:
                    raise
                attempts += 1
                if attempts > MAX_STATUS_RETRIES:
                    raise
                # urllib3 backoff: factor * 2^(retries-1)
                delay = BACKOFF_FACTOR * (2 ** (attempts - 1))
                if self.rate.min_interval_s > 0 or getattr(
                    self.transport, "sleep", False
                ):
                    time.sleep(delay)

    def get_or_create_page(self, batch_id: str, parent_url: str | None,
                           existing_url: str | None,
                           title: str | None = None) -> str:
        """Idempotent remote page (upload_notion_blocks.py:84-154): reuse
        the persisted URL, else create under the parent."""
        if existing_url:
            return existing_url
        if not parent_url:
            raise TransportError(f"no parent url for batch {batch_id}")
        payload = {"parent_url": parent_url, "title": title or batch_id}
        return self._call(f"page:{batch_id}", payload)["url"]

    def upload_block(self, batch_id: str, block_index: int,
                     block_json: str | None = None,
                     page_url: str | None = None) -> None:
        payload = {"block_json": block_json, "page_url": page_url}
        self._call(f"block:{batch_id}:{block_index}", payload)


_CLIENT: NotionClient | None = None


def executor_client(transport, rate_limiter: RateLimiter | None = None) -> NotionClient:
    """Per-executor memoized client (warm-start pattern,
    upload_notion_blocks.py:51)."""
    global _CLIENT
    if _CLIENT is None or _CLIENT.transport is not transport:
        _CLIENT = NotionClient(transport, rate_limiter)
    return _CLIENT
