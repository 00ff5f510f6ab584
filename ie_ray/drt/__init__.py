from .drs import Ref, Rel, DRS, show_linear, show_set, show_fol
from .prover import entails, satisfiable, valid

__all__ = ["Ref", "Rel", "DRS", "show_linear", "show_set", "show_fol",
           "entails", "satisfiable", "valid"]
