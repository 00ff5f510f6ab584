from .category import Category, CAT_N, CAT_NP, CAT_PP, CAT_CONJ, CAT_NP_N, CAT_Sdcl
from .ccgbank import parse_ccgbank, Leaf, Node, tree_words

__all__ = [
    "Category", "CAT_N", "CAT_NP", "CAT_PP", "CAT_CONJ", "CAT_NP_N", "CAT_Sdcl",
    "parse_ccgbank", "Leaf", "Node", "tree_words",
]
