"""Persistent TPU job worker.

The axon TPU tunnel charges a multi-minute first-execution warmup per process
and killed clients leave stale device leases, so all TPU work in this
environment should run inside ONE long-lived process.  This worker warms the
device once, then executes python job files dropped into the spool directory,
in order, writing each job's stdout/stderr next to it.

    python scripts/tpu_worker.py /tmp/tpujobs &
    cp myjob.py /tmp/tpujobs/10_myjob.py     # runs; output in 10_myjob.out
    touch /tmp/tpujobs/STOP                  # shuts the worker down
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
import time
import traceback


def main() -> None:
    spool = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tpujobs"
    os.makedirs(spool, exist_ok=True)
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if repo not in sys.path:
        sys.path.insert(0, repo)

    t0 = time.time()
    import jax
    import jax.numpy as jnp
    import numpy as np

    np.asarray(jnp.ones((8, 8)) @ jnp.ones((8, 8)))  # pay the warmup once
    print(f"[worker] ready on {jax.devices()} after {time.time() - t0:.1f}s",
          flush=True)
    with open(os.path.join(spool, "READY"), "w") as f:
        f.write(f"{time.time() - t0:.1f}\n")

    while True:
        if os.path.exists(os.path.join(spool, "STOP")):
            print("[worker] stopping", flush=True)
            return
        def settled(f):
            # settle delay: don't exec a file someone is still writing;
            # tolerate the file disappearing between listdir and stat
            try:
                return time.time() - os.path.getmtime(
                    os.path.join(spool, f)) > 2.0
            except OSError:
                return False

        jobs = sorted(
            f for f in os.listdir(spool)
            if f.endswith(".py")
            and not os.path.exists(os.path.join(spool, f + ".done"))
            and settled(f)
        )
        if not jobs:
            time.sleep(0.5)
            continue
        job = jobs[0]
        path = os.path.join(spool, job)
        out_path = os.path.join(spool, job[:-3] + ".out")
        print(f"[worker] running {job}", flush=True)
        # Re-import repo code fresh each job (edits between jobs must land);
        # jax and the device lease stay warm.
        for name in [n for n in sys.modules if n.startswith("alignsdf_tpu")]:
            del sys.modules[name]
        buf = io.StringIO()
        t0 = time.time()
        status = "ok"
        try:
            with open(path) as f:
                code = f.read()
            with contextlib.redirect_stdout(buf), contextlib.redirect_stderr(buf):
                exec(compile(code, path, "exec"), {"__name__": "__tpu_job__"})
        except BaseException:
            status = "error"
            buf.write(traceback.format_exc())
        with open(out_path, "w") as f:
            f.write(buf.getvalue())
            f.write(f"\n[worker] {job}: {status} in {time.time() - t0:.1f}s\n")
        with open(os.path.join(spool, job + ".done"), "w") as f:
            f.write(status)
        print(f"[worker] {job}: {status} in {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
