"""XProf-trace the config-3 chain (stereo 48k EQ+reverb+limiter through
the public xmtpu.effects) on the tunneled TPU.

Usage: python tools/profile_config3.py   (writes /tmp/xmtr3; open the
trace json.gz and group device ops by pid — CLAUDE.md round-3 notes).
One warmup fetch, then 3 traced steady-state iterations.
"""
import glob
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from xmtpu import effects
from xmtpu.batch import DEFAULT_BANDS
from xmtpu.ops import reverb

sr, seconds, batch = 48000, 10.0, 16
n = int(sr * seconds)
rng = np.random.default_rng(0)
x = jnp.asarray((0.3 * rng.standard_normal((batch, n, 2))).astype(np.float32))
ir = reverb.synthetic_ir(0.5, sr).astype(np.float32)
chain = [
    {"name": "equalizer", "params": {"bands": list(DEFAULT_BANDS)}},
    {"name": "reverb", "params": {"ir": ir, "wet": 0.3, "dry": 0.7}},
    {"name": "limiter", "params": {}},
]
out = effects(x, sr, chain, device_out=True)
np.asarray(out[0, :4, 0])  # force completion
jax.profiler.start_trace("/tmp/xmtr3")
for _ in range(3):
    out = effects(x, sr, chain, device_out=True)
np.asarray(out[0, :4, 0])
jax.profiler.stop_trace()
print("trace files:", [p.split("plugins/")[-1] for p in
                       glob.glob("/tmp/xmtr3/**/*", recursive=True)
                       if os.path.isfile(p)][:10])
