from .drs import Ref, Rel, DRS, show_linear

__all__ = ["Ref", "Rel", "DRS", "show_linear"]
