"""Dump the compiled HLO of the headline flagship step to
/tmp/step_hlo.txt and print selected ops (fusion/pad/copy cost
attribution — see BASELINE.md round-3 device-step decomposition)."""
import sys

import jax
import jax.numpy as jnp

from xmtpu import batch as xbatch

voice = jnp.zeros((256, 441000), jnp.int16)
bgm = jnp.zeros((256, 441000), jnp.int16)
step = jax.jit(xbatch.make_flagship_step())
txt = step.lower(voice, bgm).compile().as_text()
open("/tmp/step_hlo.txt", "w").write(txt)
print("wrote /tmp/step_hlo.txt", len(txt), "chars")
for name in sys.argv[1:]:
    for line in txt.splitlines():
        if line.strip().startswith("%" + name) or line.strip().startswith(name):
            print(line.strip()[:240])
            break
