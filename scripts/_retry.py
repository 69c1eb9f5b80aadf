"""Fresh-process retry through transient axon-tunnel failures.

A remote_compile broken pipe poisons the live JAX client permanently —
in-process retries hang (NOTES battery-6), so the only recovery is a
fresh process (fresh client / fresh tunnel connection). Scripts wrap
their device-touching top level in `reexec_on_transient`; on a
transient backend error the wrapper sleeps with backoff and re-execs
the SAME argv in a new interpreter, bounded by an env counter (the
battery's outer `timeout` still bounds total wall-clock).
"""
import os
import sys
import time

_TRANSIENT = (
    "UNAVAILABLE",
    "Broken pipe",
    "transport",
    "DEADLINE_EXCEEDED",
    "Connection reset",
    "FAILED_PRECONDITION: TPU backend error",
)

ENV = "GAGS_TUNNEL_RETRY"


def reexec_on_transient(fn, *args, max_retries: int = 3,
                        base_sleep: float = 45.0, **kw):
    try:
        return fn(*args, **kw)
    except Exception as exc:  # noqa: BLE001 — filtered below
        msg = repr(exc)
        if not any(s in msg for s in _TRANSIENT):
            raise
        prior = int(os.environ.get(ENV, "0"))
        if prior >= max_retries:
            raise
        sleep = base_sleep * (prior + 1)
        print(
            f"transient backend error (re-exec {prior + 1}/{max_retries}): "
            f"{msg:.200} — fresh process in {sleep:.0f}s",
            flush=True,
        )
        time.sleep(sleep)
        os.environ[ENV] = str(prior + 1)
        sys.stdout.flush()
        sys.stderr.flush()
        os.execv(sys.executable, [sys.executable] + sys.argv)
