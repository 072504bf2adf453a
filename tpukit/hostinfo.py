# -*- coding: utf-8 -*-
"""Host fingerprinting for persistent-compile-cache safety.

The bench/CI hosts here are migratable VMs whose visible CPU features can
change between boots. XLA:CPU caches AOT executables compiled with
`-march`-style feature lists; loading an entry produced under a different
feature set logs "Machine type used for XLA:CPU compilation doesn't match
the machine type for execution ... could lead to execution errors such as
SIGILL" — and has produced real segfaults on this box. Keying every cache
directory by a fingerprint of the visible CPU features makes stale
entries unreachable after a migration instead of loadable-and-fatal.
"""

from __future__ import annotations

import hashlib


def cpu_feature_fingerprint() -> str:
    """Short stable hash of the CPU feature flags visible to this boot."""
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(set(line.split(":", 1)[1]
                                                .split())))
                    return hashlib.sha256(feats.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform
    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]
