"""Host-fingerprinted JAX persistent-compilation-cache directory.

Import-safe before jax (no jax imports): callers must set
``JAX_COMPILATION_CACHE_DIR`` in the environment before the first jax
import for it to take effect.

Why fingerprinted: XLA:CPU AOT executables record the build machine's
CPU feature set; loading them on a different host only WARNS ("Machine
type used for XLA:CPU compilation doesn't match ...") and then silently
computes WRONG numerics (observed: a -80 dB pool-parity test reading
+3.7 dB from a cache written by a previous driver host whose avx512
prefer-no-scatter flag this host lacks). Keying the directory by the
CPU flag set makes a host change start a fresh cache instead of loading
poisoned artifacts.
"""

from __future__ import annotations

import hashlib
import platform


def host_cache_dir(prefix: str = "/tmp/xmtpu_jax_cache") -> str:
    try:
        with open("/proc/cpuinfo") as f:
            flags = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        flags = platform.processor()
    fp = hashlib.sha1((platform.machine() + flags).encode()).hexdigest()[:12]
    return f"{prefix}_{fp}"
