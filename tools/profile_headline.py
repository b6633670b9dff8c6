"""XProf-trace the headline flagship step on the tunneled TPU.

Usage: python tools/profile_headline.py   (writes /tmp/xmtr; open the
trace json.gz and group device ops by pid — CLAUDE.md round-3 notes).
One warmup fetch, then 3 traced steady-state iterations.
"""
import glob
import os
import sys

# running as `python tools/profile_headline.py` puts tools/ (not the
# repo root) at sys.path[0] — same fix as bench.py / probe_kernel_variants
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from xmtpu import batch as xbatch

sr_in, n, batch = 44100, 441000, 256
rng = np.random.default_rng(0)
voice = jnp.asarray((rng.standard_normal((batch, n)) * 9000).astype(np.int16))
bgm = jnp.asarray((np.sin(np.arange(n) / 50.0)[None].repeat(batch, 0)
                   * 12000).astype(np.int16))
step = jax.jit(xbatch.make_flagship_step())
out = step(voice, bgm)
np.asarray(out[0, :4])  # force completion (block_until_ready lies on axon)
jax.profiler.start_trace("/tmp/xmtr")
for _ in range(3):
    out = step(voice, bgm)
np.asarray(out[0, :4])
jax.profiler.stop_trace()
print("trace files:", [p.split("plugins/")[-1] for p in
                       glob.glob("/tmp/xmtr/**/*", recursive=True)
                       if os.path.isfile(p)][:10])
