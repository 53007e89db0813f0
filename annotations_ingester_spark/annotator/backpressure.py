"""Per-executor back-pressure for the annotate stage.

At 100 TB the annotate stage runs thousands of concurrent Spark tasks,
each with an in-batch thread pool — without a cap, a 1000-executor run
stampedes the NLP endpoint with executors × threads simultaneous
requests. The reference bounds this implicitly by running single-node
with a fixed 128-thread executor (reference: config.yml:64,
ingester/annotations_indexer.py:311); a distributed engine needs the
bound to be explicit. Two primitives, both process-wide:

- ``TokenBucket`` — sustained requests/sec with bounded burst;
  ``acquire()`` blocks (self-pacing) rather than erroring, so
  back-pressure propagates naturally into the Arrow batch iterator and
  from there into Spark's task scheduler.
- ``ExecutorGate`` — max-in-flight semaphore + optional bucket,
  interned per Python worker **process** via :func:`executor_gate`.
  Spark reuses Python workers across tasks (``spark.python.worker.reuse``
  defaults to true), so the gate binds across every partition that
  process ever runs — the per-executor-core cap. Cluster-wide request
  rate is then ≤ executors × cores × rate_limit_per_sec, a number an
  operator can size against the endpoint's capacity, instead of an
  unbounded function of corpus size.

The gate deliberately lives Python-side (not a Spark conf): the thing
being protected is an external HTTP service, and the pacing must happen
in the same process that opens the sockets.
"""

from __future__ import annotations

import threading
import time

__all__ = ["TokenBucket", "ExecutorGate", "executor_gate"]


class TokenBucket:
    """Thread-safe token bucket: sustained ``rate`` permits/sec with a
    burst capacity of ``burst`` tokens (default ``max(1, rate)``).
    ``acquire()`` blocks until a token is available — callers self-pace
    instead of erroring, which is what lets Spark's batch iterator act
    as the back-pressure channel."""

    def __init__(self, rate: float, burst: float | None = None) -> None:
        if rate <= 0:
            raise ValueError(f"rate must be > 0, got {rate}")
        self.rate = float(rate)
        self.capacity = float(burst) if burst is not None else max(1.0, self.rate)
        if self.capacity < 1.0:
            raise ValueError(f"burst must be >= 1, got {self.capacity}")
        self._tokens = self.capacity
        self._stamp = time.monotonic()
        self._lock = threading.Lock()

    def acquire(self) -> None:
        while True:
            with self._lock:
                now = time.monotonic()
                self._tokens = min(
                    self.capacity, self._tokens + (now - self._stamp) * self.rate
                )
                self._stamp = now
                if self._tokens >= 1.0:
                    self._tokens -= 1.0
                    return
                wait = (1.0 - self._tokens) / self.rate
            time.sleep(wait)


class ExecutorGate:
    """Composable in-flight cap + rate limit, used as a context manager
    around each HTTP request. The semaphore is acquired first so
    ``max_in_flight`` is an exact invariant; the bucket is consumed
    inside the held slot so a rate-limited call never releases its slot
    early. Either knob may be None (disabled)."""

    def __init__(
        self,
        max_in_flight: int | None = None,
        rate_limit_per_sec: float | None = None,
        rate_limit_burst: float | None = None,
    ) -> None:
        if max_in_flight is not None and max_in_flight < 1:
            raise ValueError(f"max_in_flight must be >= 1, got {max_in_flight}")
        self.max_in_flight = max_in_flight
        self._sem = (
            threading.BoundedSemaphore(max_in_flight) if max_in_flight else None
        )
        self._bucket = (
            TokenBucket(rate_limit_per_sec, rate_limit_burst)
            if rate_limit_per_sec
            else None
        )

    def __enter__(self) -> "ExecutorGate":
        if self._sem is not None:
            self._sem.acquire()
        if self._bucket is not None:
            self._bucket.acquire()
        return self

    def __exit__(self, *exc) -> bool:
        if self._sem is not None:
            self._sem.release()
        return False


_GATES: dict[str, tuple[tuple, ExecutorGate]] = {}
_GATES_LOCK = threading.Lock()


def executor_gate(
    key: str,
    max_in_flight: int | None = None,
    rate_limit_per_sec: float | None = None,
    rate_limit_burst: float | None = None,
) -> ExecutorGate:
    """Intern one :class:`ExecutorGate` per endpoint ``key`` per Python
    worker process. Every client talking to the same endpoint in the
    same process — i.e. every concurrently running partition on that
    executor core's reused worker — shares the gate, which is what makes
    the cap per-executor rather than per-task.

    Interning is by ``key`` ALONE: if it were by (key, knobs), two
    annotators registered against the same endpoint with different knob
    values would get independent semaphores/buckets and their aggregate
    in-flight/rate could exceed either configured bound, silently
    breaking the executors × cores × rate ceiling. Conflicting knob
    values for one endpoint are therefore a configuration error and
    raise."""
    knobs = (max_in_flight, rate_limit_per_sec, rate_limit_burst)
    with _GATES_LOCK:
        entry = _GATES.get(key)
        if entry is None:
            gate = ExecutorGate(max_in_flight, rate_limit_per_sec, rate_limit_burst)
            _GATES[key] = (knobs, gate)
            return gate
        prior_knobs, gate = entry
        if prior_knobs != knobs:
            raise ValueError(
                f"conflicting back-pressure knobs for endpoint {key!r}: "
                f"already interned with (max_in_flight, rate, burst)="
                f"{prior_knobs}, now requested {knobs}; one endpoint must "
                f"have exactly one bound per process"
            )
        return gate
