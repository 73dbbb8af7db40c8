"""Placeholder — full facade lands with the end-to-end slice."""

class MAGI_v2:  # pragma: no cover
    pass
