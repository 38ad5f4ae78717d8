"""Sweep the phase-2 slot-gather block width (render_fused slot_k) at
config-5 scale on the real chip.

slot_k widens each winner-slot fori iteration to k independent chunk
gathers, testing the serial-chain hypothesis for phase-2's ~53 ms. RESULT
(round 5, on chip): a WASH — 203.0/203.3/204.1/205.3 ms at k=1/2/4/8.
Mosaic already overlaps the chunk iterations; don't re-sweep unless the
kernel's gather structure changes. Usage:
timeout 3600 python tools/sweep_slot_k.py  (or --ablate for the phase-2
stage attribution: full vs gather1 vs no_gather).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp

from dtrenderer_tpu.models.scenes import make_config5
from dtrenderer_tpu.ops import fb as fblib
from dtrenderer_tpu.utils.benchlib import device_time


def main():
    ks = [int(x) for x in (sys.argv[1:] or [1, 2, 4, 8])]
    fb0 = None
    for k in ks:
        spec = make_config5(extra_opts=dict(slot_k=k))
        if fb0 is None:
            fb0 = fblib.create(spec.height, spec.width)
        dt = device_time(spec.frame, fb0.color, fb0.depth, jnp.float32(0.5),
                         iters=4, repeats=3)
        print(f"slot_k={k}: {dt*1000:.1f} ms/frame "
              f"({spec.n_tris/dt/1e6:.2f} Mtris/s)", flush=True)


def ablate():
    """Run config-5 full-frame per phase-2 ablation (subprocess per mode so
    the module-level env hook re-reads)."""
    import os
    import subprocess

    here = os.path.dirname(os.path.abspath(__file__))
    for mode in ("", "gather1", "no_gather"):
        env = dict(os.environ, DTR_ABLATE_PHASE2=mode)
        r = subprocess.run(
            [sys.executable, os.path.join(here, "sweep_slot_k.py"), "1"],
            env=env, capture_output=True, text=True, timeout=3000)
        tail = [l for l in r.stdout.splitlines() if "slot_k" in l]
        print(f"ablate={mode or 'full'}: {tail[-1] if tail else r.stderr[-300:]}",
              flush=True)


if __name__ == "__main__":
    if "--ablate" in sys.argv:
        ablate()
    else:
        print(f"backend={jax.default_backend()}", flush=True)
        main()
