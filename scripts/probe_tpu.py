"""TPU relay health probe: run FIRST in any session before TPU work.

The remote relay has two known failure modes (EXPERIMENTS.md round-2
postscript): a wedged compile service (fresh-shape compiles stall forever,
then even tiny programs hang) and worker kills on single >60s executions.
This probe answers "is the TPU usable right now" in bounded time — a stuck
client blocks inside a C call where SIGALRM handlers never run, so the
watchdog is a daemon thread that hard-exits.

Exit codes: 0 healthy, 2 unresponsive, 3 wrong backend.
Usage: python scripts/probe_tpu.py [--timeout 120]
"""
import argparse
import os
import sys
import threading
import time


def main(argv):
    p = argparse.ArgumentParser()
    p.add_argument("--timeout", type=float, default=120.0)
    args = p.parse_args(argv)

    def watch():
        time.sleep(args.timeout)
        print(f"TPU UNRESPONSIVE (no result in {args.timeout:.0f}s)",
              flush=True)
        os._exit(2)

    threading.Thread(target=watch, daemon=True).start()

    t0 = time.time()
    import jax
    import jax.numpy as jnp

    backend = jax.default_backend()
    if backend == "cpu":
        print("backend is cpu — TPU relay not registered", flush=True)
        os._exit(3)
    y = float(jax.jit(lambda a: (a @ a).sum())(jnp.ones((512, 512))))
    dt = time.time() - t0
    print(f"TPU OK: backend={backend} devices={jax.devices()} "
          f"matmul={y:.0f} in {dt:.1f}s", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
