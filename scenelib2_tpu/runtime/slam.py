"""MonoSLAM facade (host-side driver around the jitted per-frame step).

Placeholder — filled in as the runtime layer lands.
"""

from __future__ import annotations


class MonoSLAM:  # pragma: no cover - implemented with the runtime layer
    def __init__(self, *a, **kw):
        raise NotImplementedError("runtime layer under construction")
