"""Process-level restart wrapper for TPU drivers.

In-process tunnel retries (utils/retry.py) cannot revive a CRASHED TPU
worker: once the client is poisoned every subsequent call fails with
UNAVAILABLE until the process restarts (two reproduced crashes at 32^4,
docs/EXPERIMENTS.md "Operational notes"). This wrapper re-execs the
wrapped command when it dies with a crash signature, so multi-hour
sweeps survive — drivers that checkpoint their expensive state
(showdown / kc_signature --mg-ckpt, gen_gauge's periodic npz saves)
resume in seconds instead of repeating setup.

    python benchmarks/run_with_restart.py --retries 3 -- \
        python benchmarks/showdown.py --lattice 32 32 32 32 \
            --mg-ckpt /tmp/mg.npz ...

Only crash-signature failures are retried (worker crash, UNAVAILABLE,
dropped tunnel); clean non-zero exits (argument errors, assertion
failures) propagate immediately.
"""

from __future__ import annotations

import argparse
import subprocess
import sys
import time

CRASH_MARKERS = (
    "TPU worker process crashed",
    "UNAVAILABLE",
    "response body closed",
    "Connection reset",
    "connection closed",
    "Socket closed",
    "DEADLINE_EXCEEDED",
    "RESOURCE_EXHAUSTED",
)


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        description=__doc__, formatter_class=argparse.RawDescriptionHelpFormatter
    )
    ap.add_argument("--retries", type=int, default=3)
    ap.add_argument("--delay", type=float, default=20.0,
                    help="seconds before re-exec (the crashed worker "
                    "needs a moment to restart)")
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- followed by the command to run")
    args = ap.parse_args(argv)
    cmd = args.cmd
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        ap.error("no command given (use: run_with_restart.py [opts] -- cmd ...)")

    for attempt in range(args.retries + 1):
        # stream stdout through; capture stderr tail for crash detection
        proc = subprocess.Popen(cmd, stderr=subprocess.PIPE, text=True)
        err_tail: list[str] = []
        assert proc.stderr is not None
        for line in proc.stderr:
            sys.stderr.write(line)
            err_tail.append(line)
            if len(err_tail) > 200:
                err_tail.pop(0)
        rc = proc.wait()
        if rc == 0:
            return 0
        blob = "".join(err_tail)
        crashy = any(m in blob for m in CRASH_MARKERS)
        if not crashy or attempt >= args.retries:
            return rc
        print(
            f"# run_with_restart: crash signature in attempt "
            f"{attempt + 1} (rc={rc}) — re-exec in {args.delay:.0f}s "
            f"({args.retries - attempt} retries left)",
            file=sys.stderr,
            flush=True,
        )
        time.sleep(args.delay)
    return 1


if __name__ == "__main__":
    raise SystemExit(main())
