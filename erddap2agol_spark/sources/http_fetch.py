"""HTTP fetch engine for the live ERDDAP physical path (S6/S7).

The reference downloads every chunk URL through a driver-side loop:
``requests.get`` with a timeout, per-URL attempt counting, and a deque
that re-appends a failed URL to the END of the queue until its attempts
run out (``/root/reference/erddap2agol/src/data_wrangler.py:556-723``;
HTTP 413 — payload too large — gives up immediately because a retry of
the same over-large request can never succeed).

This module is the engine's executable counterpart, stdlib-only
(``urllib``; the container has no ``requests``), split in two layers:

- :func:`fetch_with_retry` — ONE URL, N attempts, per-attempt timeout.
  This is the unit each Spark SCAN TASK runs: in the connector
  (``erddap_http.py``) a chunk URL is an ``InputPartition``, so the
  fleet-level parallelism and re-scheduling the reference hand-rolls
  with its deque comes from Spark's scheduler, and only the bounded
  per-URL retry stays in Python.
- :func:`fetch_all` — MANY URLs through the reference's exact
  deque-requeue discipline, for driver-side spool flows (and as the
  behavioral spec the connector's per-task policy is tested against).
  A failed URL goes to the BACK of the queue, so one flaky endpoint
  never head-of-line-blocks the remaining chunks.
"""

from __future__ import annotations

import time
import urllib.error
import urllib.request
from collections import deque

DEFAULT_TIMEOUT_S = 120.0
DEFAULT_ATTEMPTS = 3


class FetchError(RuntimeError):
    """A URL failed all its attempts (or fatally on the first)."""

    def __init__(self, url: str, attempts: int, last_error: str):
        self.url = url
        self.attempts = attempts
        self.last_error = last_error
        super().__init__(
            f"fetch failed after {attempts} attempt(s): {url} ({last_error})"
        )


class PayloadTooLarge(FetchError):
    """HTTP 413: the request itself is over-large — retrying is useless;
    the caller must re-chunk with a smaller slice (the reference's
    griddap divider reacts the same way)."""


def fetch_bytes(url: str, timeout_s: float = DEFAULT_TIMEOUT_S) -> bytes:
    """One GET, raising on HTTP errors (urllib raises HTTPError for
    4xx/5xx on its own — the ``raise_for_status`` analog)."""
    with urllib.request.urlopen(url, timeout=timeout_s) as resp:
        return resp.read()


def fetch_with_retry(
    url: str,
    attempts: int = DEFAULT_ATTEMPTS,
    timeout_s: float = DEFAULT_TIMEOUT_S,
    backoff_s: float = 0.5,
) -> bytes:
    """Fetch one URL with up to ``attempts`` tries and a per-attempt
    timeout. Timeouts, connection errors, and 5xx responses retry (with
    linear backoff); HTTP 413 raises :class:`PayloadTooLarge`
    immediately; other 4xx are caller bugs and also never retry."""
    import http.client

    last = "no attempt made"
    for attempt in range(1, max(1, attempts) + 1):
        try:
            return fetch_bytes(url, timeout_s=timeout_s)
        except urllib.error.HTTPError as e:
            last = f"HTTP {e.code}"
            if e.code == 413:
                raise PayloadTooLarge(url, attempt, last) from e
            if 400 <= e.code < 500:
                raise FetchError(url, attempt, last) from e
            # 5xx: transient server side, retry
        except (
            urllib.error.URLError,
            TimeoutError,
            OSError,
            # mid-response drops from a flaky server surface as
            # http.client exceptions (BadStatusLine, IncompleteRead) —
            # transient, retryable
            http.client.HTTPException,
        ) as e:
            last = f"{type(e).__name__}: {e}"
        if attempt < attempts and backoff_s > 0:
            time.sleep(backoff_s * attempt)
    raise FetchError(url, max(1, attempts), last)


def fetch_if_modified(
    url: str,
    since: str | None = None,
    timeout_s: float = DEFAULT_TIMEOUT_S,
) -> tuple[bytes | None, str | None]:
    """Conditional GET — the wire form of the reference's Last-Modified
    gate (ST2: 'source not newer -> skip the download entirely').

    ``since`` is the HTTP-date previously returned by this function.
    Returns ``(body, last_modified)`` on 200 and ``(None, since)`` on
    304 Not Modified — the caller skips the refresh without transferring
    a byte. Callers should record ``last_modified`` only AFTER their
    sink commits (the same don't-record-until-commit discipline as
    streaming/nrt.refresh), so a crash between fetch and commit replays
    as a plain re-fetch.
    """
    req = urllib.request.Request(url)
    if since:
        req.add_header("If-Modified-Since", since)
    try:
        with urllib.request.urlopen(req, timeout=timeout_s) as resp:
            return resp.read(), resp.headers.get("Last-Modified")
    except urllib.error.HTTPError as e:
        if e.code == 304:
            return None, since
        raise


def fetch_all(
    urls: list[str],
    attempts: int = DEFAULT_ATTEMPTS,
    timeout_s: float = DEFAULT_TIMEOUT_S,
    max_workers: int = 1,
) -> tuple[dict[str, bytes], dict[str, str]]:
    """Fetch many URLs with the reference's deque-requeue discipline:
    pop from the front, and on a retryable failure re-append to the BACK
    (other URLs proceed before the flaky one is retried) until the URL's
    attempt count reaches ``attempts``. Returns ``(results, failures)``
    — ``results[url] = bytes`` for every success, ``failures[url] =
    reason`` for every URL that exhausted its attempts (a fatal 4xx/413
    fails immediately without requeueing, as does any non-HTTP error
    such as a malformed URL). EVERY input URL lands in exactly one of
    the two dicts — the accounting contract fleet sweeps rely on.

    ``max_workers > 1`` drains the SAME deque from a thread pool — the
    per-URL attempt accounting, back-of-queue requeue, and fatal-4xx
    rules are identical; only the in-flight width changes. Use it for
    driver-side fleet sweeps (e.g. thousands of .das documents) where a
    serial loop would make metadata latency the bottleneck; the DATA
    paths don't need it — their parallelism is Spark tasks.
    """
    import threading

    # Deduplicate while preserving order: duplicate inputs would share
    # one attempt counter (halving the retry budget) and could land in
    # BOTH dicts when one instance succeeds and another fails fatally
    # (ADVICE r5). The contract is per-URL, so each distinct URL is
    # fetched once.
    queue: deque[str] = deque(dict.fromkeys(urls))
    tried: dict[str, int] = {u: 0 for u in queue}
    results: dict[str, bytes] = {}
    failures: dict[str, str] = {}
    lock = threading.Lock()

    import http.client

    # termination: a worker exits when the queue is empty; a concurrent
    # worker about to REQUEUE its failed URL is still inside its own
    # drain loop and pops the requeued entry itself — correctness never
    # depends on exited workers, only tail parallelism narrows
    def drain() -> None:
        while True:
            with lock:
                if not queue:
                    return
                url = queue.popleft()
                tried[url] += 1
                n_try = tried[url]
            try:
                body = fetch_bytes(url, timeout_s=timeout_s)
            except urllib.error.HTTPError as e:
                with lock:
                    if 400 <= e.code < 500:  # incl. 413: retry can't succeed
                        failures[url] = f"HTTP {e.code}"
                    elif n_try < attempts:
                        queue.append(url)
                    else:
                        failures[url] = f"HTTP {e.code}"
                continue
            except (
                urllib.error.URLError,
                TimeoutError,
                OSError,
                http.client.HTTPException,  # mid-response drop: transient
            ) as e:
                with lock:
                    if n_try < attempts:
                        queue.append(url)
                    else:
                        failures[url] = f"{type(e).__name__}: {e}"
                continue
            except Exception as e:  # noqa: BLE001 — the accounting contract:
                # an unexpected error (malformed URL ValueError, decode bug)
                # must land the URL in `failures`, never die with a worker
                # thread and leave it in NEITHER dict (review r5 #1)
                with lock:
                    failures[url] = f"{type(e).__name__}: {e}"
                continue
            with lock:
                results[url] = body

    if max_workers <= 1:
        drain()
    else:
        threads = [
            threading.Thread(target=drain, daemon=True)
            for _ in range(min(max_workers, max(1, len(urls))))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    return results, failures
