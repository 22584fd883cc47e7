"""SIGTERM-graceful preemption handling for the training CLIs.

Beyond reference: the original framework's recovery is restart-based only
(SURVEY.md §5 — ``--cont`` re-derives the epoch from the last checkpoint,
reference train.py:38-48, with no in-process failure handling). TPU pods
and preemptible cloud VMs deliver SIGTERM with a grace window before the
kill; catching it lets the trainer finish the in-flight dispatch group,
save a checkpoint at the exact step reached, and exit with a distinct
status so schedulers requeue the job with ``--cont`` and lose zero steps
(instead of up to ``save_checkpoints_steps`` of work).

The handler only flips a flag (async-signal-safe); the training loop polls
it at each dispatch-group boundary (multi-host: OR-reduced across
processes so every host leaves the collective loop together — see
Trainer._should_stop).
"""

from __future__ import annotations

import logging
import signal

# BSD sysexits EX_TEMPFAIL: "temporary failure, retry later" — the
# conventional requeue-me exit status.
EXIT_PREEMPTED = 75

log = logging.getLogger("tfks.preempt")


def install_preemption_handler(trainer) -> None:
    """Route SIGTERM to ``trainer.request_stop()``.

    Call from the CLI main thread after the trainer is constructed
    (CPython delivers signals to the main thread only)."""

    def _handler(signum, frame):
        log.info(
            "SIGTERM: finishing the in-flight dispatch group, then "
            "checkpointing and exiting %d (resume with --cont)",
            EXIT_PREEMPTED,
        )
        trainer.request_stop()

    signal.signal(signal.SIGTERM, _handler)


def exit_code_if_preempted(trainer) -> int | None:
    """Returns EXIT_PREEMPTED (and logs the resume hint) when the epoch was
    cut short by request_stop(); None for a normal epoch end.

    Keys on ``stop_acknowledged`` (the collectively-agreed stop), not the
    raw local flag: on a multi-host pod a SIGTERM that lands on one host
    AFTER the loop's last collective poll must not make that host exit 75
    while the others continue into the next phase's collectives — the next
    phase's first poll will acknowledge it on every host together."""
    if not trainer.stop_acknowledged:
        return None
    step = int(trainer.state.step) if trainer.state is not None else 0
    log.info(
        "preempted: checkpoint saved at step %d; rerun with --cont to "
        "resume the remainder of the epoch", step,
    )
    return EXIT_PREEMPTED
