"""Host-keyed persistent-compilation-cache paths.

XLA:CPU caches ahead-of-time compiled code keyed by HLO only; an entry
compiled on a host with different CPU features loads with a warning and
can SIGILL at run time (cpu_aot_loader "machine type ... doesn't match").
Keying the cache directory by a host CPU signature makes a moved cache
directory simply cold instead of lethal.
"""

from __future__ import annotations

import hashlib
import platform


def host_cache_key() -> str:
    """Short digest of the CPU identity (ISA feature flags + arch)."""
    sig = platform.machine()
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    sig += ":" + line.split(":", 1)[1].strip()
                    break
    except OSError:
        sig += ":" + platform.processor()
    return hashlib.sha256(sig.encode()).hexdigest()[:12]


def host_cache_dir(base: str) -> str:
    """<base>-<hostkey>: a persistent cache path safe across machines."""
    return f"{base}-{host_cache_key()}"
