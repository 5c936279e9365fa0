"""Tunnel health probe: exits 0 iff a tiny blocked dispatch returns quickly.

Run under `timeout N` from a shell loop — a degraded tunnel hangs the first
dispatch in a futex wait (NOTES.md), which cannot be cancelled in-process.
The process exits immediately after the probe so it never holds the tunnel's
single client slot.
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def main():
    t0 = time.perf_counter()
    r = jax.jit(lambda x: jnp.sum(x * 2.0))(jnp.ones(128))
    np.asarray(r)
    ms1 = (time.perf_counter() - t0) * 1e3
    t0 = time.perf_counter()
    r = jax.jit(lambda x: jnp.sum(x * 3.0))(jnp.ones(128))
    np.asarray(r)
    ms2 = (time.perf_counter() - t0) * 1e3
    print(f"probe: {ms1:.1f} ms (cold), {ms2:.1f} ms (warm)", flush=True)
    # warm dispatch round-trip should be tens of ms on a healthy tunnel
    sys.exit(0 if ms2 < float(sys.argv[1] if len(sys.argv) > 1 else 150) else 2)


if __name__ == "__main__":
    main()
