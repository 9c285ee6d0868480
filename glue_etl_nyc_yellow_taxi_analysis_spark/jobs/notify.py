"""Terminal-state notification seam (the SNS-email leg of orchestration).

The reference wires an EventBridge rule on Glue job state change to an SNS
topic that emails on SUCCEEDED/FAILED (``Rules-CloudFormation-Template.json:
142-168``).  The open-source twin is a process-local dispatcher: a job run
is wrapped in ``run_with_notification``, which emits ONE terminal payload —
``{"source": ..., "job": ..., "state": "SUCCEEDED"|"FAILED", "detail":
{...}}`` — to every registered sink, then re-raises on failure so exit
codes still drive schedulers.

Sinks are plain callables; two ship here:
- ``jsonl_sink(path)`` — append the payload as one JSON line (the durable
  stand-in for the email: tail it, ship it, alert on it).
- ``stderr_sink`` — human-readable one-liner.
A real deployment registers its own (SNS publish, Slack webhook, ...);
the seam is the callable signature, not the transport.

Streaming gets the same leg via ``attach_streaming_listener``: a
``StreamingQueryListener`` that forwards query termination — with or
without exception — to the notifier, so a dying ingest loop notifies
exactly like a dying batch job.
"""

from __future__ import annotations

import json
import sys
import time
from typing import Callable

Payload = dict
Sink = Callable[[Payload], None]


def stderr_sink(payload: Payload) -> None:
    print(
        f"[notify] job={payload.get('job')} state={payload.get('state')} "
        f"detail={json.dumps(payload.get('detail', {}), default=str)}",
        file=sys.stderr,
    )


def jsonl_sink(path: str) -> Sink:
    def _sink(payload: Payload) -> None:
        with open(path, "a") as f:
            f.write(json.dumps(payload, default=str) + "\n")

    return _sink


class JobNotifier:
    """Fan-out dispatcher for terminal-state payloads.

    A sink that raises must not mask the job outcome (the reference's SNS
    publish failing would not un-succeed the Glue job) — sink errors are
    collected on ``sink_errors``, never propagated.
    """

    def __init__(self, sinks: list[Sink] | None = None):
        self.sinks: list[Sink] = list(sinks or [])
        self.sink_errors: list[tuple[Sink, Exception]] = []

    def add(self, sink: Sink) -> "JobNotifier":
        self.sinks.append(sink)
        return self

    def notify(self, payload: Payload) -> None:
        for s in self.sinks:
            try:
                s(payload)
            except Exception as e:  # noqa: BLE001 — sink failure is non-fatal
                self.sink_errors.append((s, e))


def run_with_notification(
    job: str,
    fn: Callable[[], object],
    notifier: JobNotifier,
    detail: dict | None = None,
) -> object:
    """Run ``fn``; emit exactly one SUCCEEDED/FAILED payload; re-raise on
    failure (the scheduler still sees the exit code — notification is a
    side channel, not error handling)."""
    t0 = time.time()
    base = {"source": "glue_etl_nyc_yellow_taxi_analysis_spark", "job": job}
    try:
        result = fn()
    except BaseException as e:
        notifier.notify(
            {
                **base,
                "state": "FAILED",
                "detail": {
                    **(detail or {}),
                    "error_class": type(e).__name__,
                    "error": str(e),
                    "seconds": round(time.time() - t0, 3),
                },
            }
        )
        raise
    notifier.notify(
        {
            **base,
            "state": "SUCCEEDED",
            "detail": {
                **(detail or {}),
                "result": result if isinstance(result, (int, str, dict)) else None,
                "seconds": round(time.time() - t0, 3),
            },
        }
    )
    return result


def attach_streaming_listener(spark, notifier: JobNotifier, job: str = "stream"):
    """Forward Structured Streaming query termination to the notifier.

    ``onQueryTerminated`` fires once per query, with ``exception`` set on
    failure — the streaming twin of the Glue job-state rule.  Returns the
    listener so callers can ``spark.streams.removeListener`` it.
    """
    from pyspark.sql.streaming import StreamingQueryListener

    class _TerminalStateListener(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            pass

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            failed = event.exception is not None
            notifier.notify(
                {
                    "source": "glue_etl_nyc_yellow_taxi_analysis_spark",
                    "job": job,
                    "state": "FAILED" if failed else "SUCCEEDED",
                    "detail": {
                        "query_id": str(event.id),
                        "run_id": str(event.runId),
                        **({"error": str(event.exception)} if failed else {}),
                    },
                }
            )

    listener = _TerminalStateListener()
    spark.streams.addListener(listener)
    return listener
