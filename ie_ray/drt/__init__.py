from .drs import Ref, Rel, DRS, show_linear, show_set, show_fol

__all__ = ["Ref", "Rel", "DRS", "show_linear", "show_set", "show_fol"]
