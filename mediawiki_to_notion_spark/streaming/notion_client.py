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
    def __init__(self, status: int,
                 retry_after_s: float | None = None) -> None:
        super().__init__(f"HTTP {status}")
        self.status = status
        # a 429's advertised Retry-After (seconds), when the server
        # sent one — the adaptive pacer adopts it as the interval
        # floor instead of multiplicative guessing (VERDICT r9 #5)
        self.retry_after_s = retry_after_s


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
    a single sink partition + this pacer gives the same guarantee.

    ``clock`` is any object with ``monotonic()``/``sleep()`` (defaults
    to the ``time`` module) — injected by tests to run pacing against a
    virtual clock.  ``on_throttle``/``on_success`` are no-op feedback
    hooks; :class:`AdaptiveRateLimiter` overrides them."""

    min_interval_s: float = 0.0
    _last: float = field(default=0.0, repr=False)
    clock: object = field(default=time, repr=False)

    def wait(self) -> None:
        if self.min_interval_s <= 0:
            return
        now = self.clock.monotonic()
        delta = now - self._last
        if delta < self.min_interval_s:
            self.clock.sleep(self.min_interval_s - delta)
        self._last = self.clock.monotonic()

    def on_throttle(self, n: int = 1,
                    retry_after_s: float | None = None) -> None:
        """Feedback hook: the API said 429 (n times), optionally
        advertising a Retry-After of ``retry_after_s``.  No-op here."""

    def on_success(self) -> None:
        """Feedback hook: a call completed without throttling."""


@dataclass
class AdaptiveRateLimiter(RateLimiter):
    """429-responsive pacing (VERDICT r8 brief #6): the reference's
    INTENT is kindness to the API — the Retry policy merely survives
    throttling, it does not reduce offered load.  This limiter widens
    the pacing interval multiplicatively on every observed 429, decaying
    it geometrically back toward the configured base on successes, so
    the aggregate request rate converges UNDER the server's actual
    budget instead of hammering the retry path.  The verbatim Retry
    semantics (statuses, counts, backoff) are untouched — this only
    changes how long we wait BETWEEN calls.

    ``min_interval_s`` is the configured base (the static politeness
    budget, ``UploadConfig`` docs); the dynamic interval lives in the
    same field so ``wait()`` is inherited unchanged."""

    max_interval_s: float = 0.0          # 0 -> 32x the base (or floor)
    widen_factor: float = 2.0
    decay_factor: float = 0.98           # surplus decay per success (gentle re-probe)
    min_throttle_interval_s: float = 0.05  # first widen when base == 0
    _base: float = field(default=0.0, repr=False)

    def __post_init__(self) -> None:
        self._base = self.min_interval_s
        if self.max_interval_s <= 0:
            self.max_interval_s = 32 * max(
                self._base, self.min_throttle_interval_s)

    def on_throttle(self, n: int = 1,
                    retry_after_s: float | None = None) -> None:
        # Retry-After adoption (VERDICT r9 #5): when the server
        # advertises a precise recovery interval, jump the pacing
        # interval straight to it — one 429 instead of several blind
        # doublings, the kindness the reference intends
        # (upload_notion_blocks.py:157-184).  A hint that does NOT
        # raise the interval (server still throttling at/below the
        # adopted floor) falls through to the multiplicative widen so
        # adaptation can never stall on a stale advertisement.
        if retry_after_s and retry_after_s > self.min_interval_s:
            self.min_interval_s = min(
                self.max_interval_s,
                max(retry_after_s, self.min_throttle_interval_s,
                    self._base),
            )
            return
        for _ in range(max(1, n)):
            self.min_interval_s = min(
                self.max_interval_s,
                max(self.min_interval_s * self.widen_factor,
                    self.min_throttle_interval_s, self._base),
            )

    def on_success(self) -> None:
        surplus = (self.min_interval_s - self._base) * self.decay_factor
        self.min_interval_s = (
            self._base if surplus < 1e-4 else self._base + surplus
        )


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
            try:
                result = self.transport.request(op_key, payload)
            finally:
                # transports owning their retries can expose how many
                # 429s the retry loop absorbed (HttpTransport does) so
                # adaptive pacing still sees throttle density — plus
                # the largest Retry-After those 429s advertised
                pop = getattr(self.transport, "pop_throttle_count", None)
                n429 = pop() if callable(pop) else 0
                pop_h = getattr(self.transport, "pop_retry_after_hint",
                                None)
                hint = pop_h() if callable(pop_h) else None
                if n429:
                    self.rate.on_throttle(n429, retry_after_s=hint)
            if not n429:
                self.rate.on_success()
            return result
        attempts = 0
        while True:
            self.rate.wait()
            try:
                result = self.transport.request(op_key, payload)
                self.rate.on_success()
                return result
            except HTTPStatusError as exc:
                if exc.status == 429:
                    self.rate.on_throttle(
                        retry_after_s=getattr(exc, "retry_after_s", None))
                if exc.status not in RETRYABLE_STATUSES:
                    raise
                attempts += 1
                if attempts > MAX_STATUS_RETRIES:
                    raise
                # urllib3 backoff: factor * 2^(retries-1); sleeps ride
                # the limiter's clock so virtual-clock tests stay
                # coherent (real clock by default — behavior unchanged)
                delay = BACKOFF_FACTOR * (2 ** (attempts - 1))
                ra = getattr(exc, "retry_after_s", None)
                if ra:
                    # mirror urllib3 respect_retry_after_header: the
                    # advertised wait wins over the computed backoff
                    delay = max(delay, ra)
                if self.rate.min_interval_s > 0 or getattr(
                    self.transport, "sleep", False
                ):
                    self.rate.clock.sleep(delay)

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
