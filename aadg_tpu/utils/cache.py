"""Machine-keyed persistent JAX compilation cache.

The persistent compile cache stores XLA:CPU AOT executables specialized to
the *compiling* host's CPU features. Loading an entry written on a different
machine fails (``cpu_aot_loader.cc`` machine-feature mismatch — every program
silently recompiles cold) or worse could SIGILL. Shared caches (NFS homes,
images snapshotted on one host and run on another) hit this routinely, so we
key the cache directory by a fingerprint of the platform + CPU feature set:
entries written on a foreign machine land in a different subdirectory and
are simply never seen.
"""

import hashlib
import os
import platform


def machine_fingerprint() -> str:
    """Short stable hash of (OS, arch, CPU feature flags) for this host."""
    parts = [platform.system(), platform.machine()]
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith(("flags", "Features")):
                    # flag ORDER is stable per kernel; sort anyway so the
                    # fingerprint survives kernel reordering
                    parts.append(" ".join(sorted(line.split(":", 1)[1].split())))
                    break
    except OSError:
        parts.append(platform.processor())
    return hashlib.sha256("|".join(parts).encode()).hexdigest()[:12]


def setup_compile_cache(base: str = "~/.cache/jax_test_compilation",
                        min_compile_secs: float = 2.0) -> str:
    """Point JAX's persistent compile cache at a machine-keyed subdir.

    Returns the directory used. Safe to call more than once; a no-op if the
    jax config keys are unavailable.
    """
    import jax

    cache = os.path.join(os.path.expanduser(base), machine_fingerprint())
    os.makedirs(cache, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          min_compile_secs)
    except Exception:
        pass
    return cache
