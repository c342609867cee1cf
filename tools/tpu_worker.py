"""Persistent TPU job worker.

The axon TPU tunnel allows one claim at a time and poisons the grant for
~60 s when a holding process is killed (NEXT.md).  This worker claims the
device once and then executes job scripts submitted to a spool directory,
so iterative benchmarking never re-claims or kills a TPU-holding process.

Usage:
    python tools/tpu_worker.py [--spool ~/.tpuq] &
    # submit: write  <name>.py  into <spool>/jobs/
    # result: <spool>/done/<name>.out  (stdout+stderr; last line 'RC=<n>')

Each job runs via exec() in a fresh namespace inside this process, with a
live jax already initialized on the TPU.  Jobs therefore share the process
(imports/caches persist -- by design: compiled executables stay warm).
A job named 'quit.py' shuts the worker down.
"""

from __future__ import annotations

import argparse
import io
import os
import sys
import time
import traceback
from contextlib import redirect_stderr, redirect_stdout
from pathlib import Path


def main() -> None:
    ap = argparse.ArgumentParser()
    # Default under $HOME, created 0700: a world-writable fixed /tmp spool
    # would let any local user drop a job that this process exec()s.
    ap.add_argument("--spool", default=os.path.expanduser("~/.tpuq"))
    args = ap.parse_args()

    spool = Path(os.path.expanduser(args.spool))
    jobs = spool / "jobs"
    done = spool / "done"
    jobs.mkdir(parents=True, exist_ok=True, mode=0o700)
    done.mkdir(parents=True, exist_ok=True, mode=0o700)
    os.chmod(spool, 0o700)
    uid = os.getuid()

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    print(f"[tpu_worker] devices: {jax.devices()}", flush=True)
    (spool / "ready").write_text(str(os.getpid()))

    while True:
        pending = sorted(
            (p for p in jobs.glob("*.py") if p.stat().st_uid == uid),
            key=lambda p: p.stat().st_mtime,
        )
        if not pending:
            time.sleep(0.5)
            continue
        job = pending[0]
        name = job.stem
        src = job.read_text()
        job.unlink()
        if name == "quit":
            print("[tpu_worker] quit", flush=True)
            break
        print(f"[tpu_worker] run {name}", flush=True)
        # Purge repo modules so each job sees the current working tree
        # (jax and its compiled-executable caches stay warm).
        for mod in [m for m in sys.modules if m.split(".")[0] in
                    ("cylinder_pose_estimation_tpu", "bench", "bench_stream",
                     "__graft_entry__")]:
            del sys.modules[mod]
        buf = io.StringIO()
        rc = 0
        t0 = time.perf_counter()
        try:
            with redirect_stdout(buf), redirect_stderr(buf):
                exec(compile(src, str(job), "exec"), {"__name__": "__tpuq__"})
        except SystemExit as e:
            rc = int(e.code or 0)
        except Exception:
            buf.write(traceback.format_exc())
            rc = 1
        buf.write(f"\n[took {time.perf_counter() - t0:.1f}s]\nRC={rc}\n")
        (done / f"{name}.out").write_text(buf.getvalue())
        print(f"[tpu_worker] done {name} rc={rc}", flush=True)


if __name__ == "__main__":
    main()
