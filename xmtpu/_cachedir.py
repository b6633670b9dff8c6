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
CPU identity makes a host change start a fresh cache instead of loading
poisoned artifacts.

The key includes the cpuinfo ``model name`` line, not just ``flags``:
XLA adds LLVM *tuning* features (``prefer-no-scatter``/``prefer-no-
gather``) chosen from the CPU model, which never appear in the flags
line — two hosts with identical flag sets but different models produced
a mismatched (warning-only) AOT load through the flags-keyed cache
(seen 2026-08-18 in the virtual-mesh dryrun).
"""

from __future__ import annotations

import hashlib
import platform


def host_cache_dir(prefix: str = "/tmp/xmtpu_jax_cache") -> str:
    ident = [platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for ln in f:
                if ln.startswith(("flags", "model name", "vendor_id",
                                  "cpu family", "model\t", "stepping")):
                    ident.append(ln.strip())
                if ln.startswith("power management"):
                    break  # one processor block is enough
    except OSError:
        ident.append(platform.processor())
    fp = hashlib.sha1("\n".join(sorted(set(ident))).encode()).hexdigest()[:12]
    return f"{prefix}_{fp}"
