"""CCGBANK (LDC 2005T13 AUTO format) derivation parser.

Input is a one-line s-expression of the form::

    (<T S[dcl] 1 2> (<T NP 0 2> (<L NP/N DT DT The NP/N>) (<L N NN NN boy N>)) ...)

``<T cat head nchildren>`` are internal (rule) nodes, ``<L cat pos pos word
predarg>`` are leaves.  Parity: the reference's fast parser is
``src/python/marbles/ie/ccg/__init__.py:49-86`` (parse_ccg_derivation2); this
is a fresh recursive-descent implementation producing small node objects
instead of nested lists.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import List, Optional, Union

from .category import Category


@dataclass
class Leaf:
    cat: Category          # the clean category used for combination
    pos: str               # POS tag (second field kept; reference uses tags[0])
    word: str
    predarg: Optional[Category]  # category with predarg tags (may equal cat)
    idx: int = -1          # word index, assigned after parse


@dataclass
class Node:
    cat: Category
    head: int              # 0/1: which child is the head
    children: List[Union["Node", Leaf]] = field(default_factory=list)


_TOK_RE = re.compile(r"\(<([TL])\s+([^>]*)>|\(|\)")


def parse_ccgbank(text: str):
    """Parse a CCGBANK derivation string into a Leaf/Node tree.

    Returns the root node and assigns leaf word indexes left-to-right.
    """
    pos = 0
    n = len(text)
    stack: List[Node] = []
    root = None
    leaves: List[Leaf] = []
    while pos < n:
        m = _TOK_RE.search(text, pos)
        if m is None:
            break
        pos = m.end()
        if m.group(1) == "T":
            parts = m.group(2).split()
            # <T cat head count>
            node = Node(Category.parse(parts[0]), int(parts[1]))
            if stack:
                stack[-1].children.append(node)
            stack.append(node)
            if root is None:
                root = node
        elif m.group(1) == "L":
            parts = m.group(2).split()
            # <L cat pos1 pos2 word predarg>
            cat = Category.parse(parts[0])
            predarg = None
            if len(parts) >= 5:
                try:
                    predarg = Category.parse(parts[4])
                except ValueError:
                    predarg = None
            word = parts[3].replace("-LAB-", "<").replace("-RAB-", ">") \
                if len(parts) >= 4 else "_"
            leaf = Leaf(cat, parts[1], word, predarg, idx=len(leaves))
            leaves.append(leaf)
            if stack:
                stack[-1].children.append(leaf)
            else:
                root = leaf
            # the leaf s-expr closes with ')' consumed by the next ')' token;
            # CCGBANK writes "(<L ...>)" — skip its own closer below
            closer = text.find(")", pos)
            if closer >= 0:
                pos = closer + 1
        else:
            tok = m.group(0)
            if tok == ")":
                if stack:
                    stack.pop()
    if root is None:
        raise ValueError("empty derivation")
    return root, leaves


def tree_words(leaves) -> str:
    return " ".join(l.word for l in leaves)


def to_ccgbank(node) -> str:
    """Serialize a Leaf/Node tree back to the one-line CCGBANK form —
    ``parse_ccgbank(to_ccgbank(t))`` round-trips (parity:
    get_predarg_ccgbank identity, ie/test/exec_test.py:100-101)."""
    if isinstance(node, Leaf):
        predarg = node.predarg.signature if node.predarg else node.cat.signature
        return "(<L %s %s %s %s %s>)" % (node.cat.signature, node.pos,
                                         node.pos, node.word, predarg)
    kids = " ".join(to_ccgbank(c) for c in node.children)
    return "(<T %s %d %d> %s )" % (node.cat.signature, node.head,
                                   len(node.children), kids)
