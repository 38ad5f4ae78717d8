"""Honest device-side timing.

On the axon-tunneled TPU platform, `jax.block_until_ready` does not reliably block
(dispatch-only returns) and fetching any output transfers the whole buffer over the
tunnel — so naive wall-clock benchmarking measures the network, not the chip. This
harness times a DEVICE-SIDE fori_loop that re-runs the function `iters` times with a
value-preserving per-iteration input perturbation (so XLA cannot hoist the body out of
the loop), reduces every output to one scalar, and fetches only those 4 bytes. Two runs
with different iteration counts are differenced to cancel dispatch + fetch + RTT
overhead.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def _perturb(args, acc):
    """Thread a data dependency on the accumulator into the inputs.

    eps = acc * 1e-45 flushes to zero at runtime (TPU subnormal flush / negligible)
    but XLA cannot prove it, so the loop body depends on the previous iteration and
    can be neither hoisted nor parallelized. Int leaves get eps != 0 (always 0).
    """
    eps = acc * jnp.float32(1e-45)
    eps_i = (eps != 0).astype(jnp.int32)
    leaves, treedef = jax.tree.flatten(args)
    out = []
    # Perturb EVERY leaf: a function may discard some inputs (e.g. a frame fn
    # clears the framebuffer it was handed), and any un-perturbed path lets XLA
    # hoist that computation out of the timing loop.
    for leaf in leaves:
        if hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.floating):
            out.append(leaf + eps.astype(leaf.dtype))
        elif hasattr(leaf, "dtype") and jnp.issubdtype(leaf.dtype, jnp.integer):
            out.append(leaf + eps_i.astype(leaf.dtype))
        else:
            out.append(leaf)
    return jax.tree.unflatten(treedef, out)


def _reduce_all(tree):
    leaves = [l for l in jax.tree.leaves(tree) if hasattr(l, "dtype")]
    acc = jnp.float32(0.0)
    for l in leaves:
        x = l.astype(jnp.float32) if jnp.issubdtype(l.dtype, jnp.integer) else l
        x = jnp.where(jnp.isfinite(x), x, 0.0).astype(jnp.float32)
        acc = acc + jnp.sum(x)
    return acc


def device_time(fn, *args, iters: int = 20, warmup_iters: int = 2,
                repeats: int = 1) -> float:
    """Seconds per call of fn(*args), measured on device. fn must be jittable.

    ONE compiled program (a while_loop with a traced trip count) serves both the
    short and long runs, so remote-compile latency is paid once per fn.

    repeats > 1: repeat the whole short/long differencing and return the MEDIAN
    per-call time — remote-bench variance is ~±5-8% run-to-run (CLAUDE.md), so
    headline numbers should use repeats=3.
    """

    @jax.jit
    def run(n, args):
        def cond(state):
            i, _ = state
            return i < n

        def body(state):
            i, acc = state
            out = fn(*_perturb(args, acc))
            return i + 1, acc + _reduce_all(out)

        _, acc = jax.lax.while_loop(cond, body, (jnp.int32(0), jnp.float32(0.0)))
        return acc

    # Compile + warm.
    float(np.asarray(run(warmup_iters, args)))

    samples = []
    for _ in range(max(1, repeats)):
        t0 = time.perf_counter()
        float(np.asarray(run(warmup_iters, args)))
        t_small = time.perf_counter() - t0

        t0 = time.perf_counter()
        float(np.asarray(run(warmup_iters + iters, args)))
        t_big = time.perf_counter() - t0
        samples.append(max(t_big - t_small, 1e-9) / iters)

    return float(np.median(samples))
