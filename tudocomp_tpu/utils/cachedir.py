"""Machine-feature-keyed persistent compilation cache directories.

XLA:CPU's persistent cache stores AOT-compiled executables that embed
the compiling machine's CPU feature set; loading such an artifact on a
host with different features logs ``cpu_aot_loader`` feature-mismatch
errors and "could lead to execution errors such as SIGILL".  Sharing
one cache directory across heterogeneous machines therefore risks both
noise and crashes (observed: a stale-entry read segfaulting a test
run).  The fix is structural: key the directory name by a digest of
this host's CPU feature flags so two machines with different features
can never read each other's CPU artifacts.

The TPU cache (`/root/.cache/jaxcomp`) is not keyed — TPU executables
target the TPU, not the host CPU.
"""

from __future__ import annotations

import hashlib
import os
import platform


def _cpu_feature_digest() -> str:
    """Stable 12-hex digest of this host's CPU feature flags."""
    flags = ""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    flags = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    key = f"{platform.machine()}|{flags}"
    return hashlib.sha256(key.encode()).hexdigest()[:12]


def cpu_cache_dir(base: str = "/root/.cache") -> str:
    """Per-CPU-feature-set persistent cache dir for XLA:CPU artifacts."""
    return os.path.join(base, f"jaxcomp-cpu-{_cpu_feature_digest()}")
