"""Per-token semantics: POS classes, lemmatization, and leaf productions.

A leaf production is a ``Sem``: the token's CCG category paired with a nested
*ref tree* (one union-find ``Ref`` per category atom) plus the DRS conditions
the token contributes.  Variable sharing inside a leaf's tree encodes the
reference's functor templates (``src/python/marbles/ie/ccg/model.py:256-266``,
data ``functor_templates.dat``), re-derived here from category shape:

* modifiers ``X/X`` share all refs pairwise,
* determiners/coercions ``NP/N`` share the single ref,
* ``PP/NP`` prepositions share (observed golden: ``to(X2),Merryweather(X2)``),
* pass-through words (*to*, modals, auxiliaries) mirror result/argument,
* content verbs with an S-complement share only the subject NP
  (subject/object control, cf. template ``(S[dcl]\\NP_118)/(S[to]_119\\NP_118)``).

Condition semantics mirror ``src/python/marbles/ie/semantics/lexeme.py``
(get_production :486-851, _build_conditions :372-425).
"""

from __future__ import annotations

import re
from typing import List, Optional, Tuple, Union

from ..ccg.category import Category
from ..drt.drs import Ref, Rel
from .reftypes import (
    ADV_LOCATION, PRONOUN_MASK, RT_ANAPHORA, RT_ATTRIBUTE, RT_DATE,
    RT_ENTITY, RT_EVENT, RT_EVENT_ATTRIB, RT_EVENT_MODAL, RT_INTERSECTION,
    RT_LOCATION, RT_NEGATE, RT_NUMBER, RT_PLURAL, RT_POSSESSIVE,
    RT_PP, RT_PROPERNAME, RT_UNION)

# ---------------------------------------------------------------------------
# POS classes (Penn tags, as emitted in CCGBANK leaves)
# ---------------------------------------------------------------------------

POS_VERBS = {"VB", "VBD", "VBG", "VBN", "VBP", "VBZ"}
POS_NOUNS = {"NN", "NNS"}
POS_PROPER = {"NNP", "NNPS"}
POS_PRONOUNS = {"PRP", "PRP$", "WP", "WP$"}
POS_ADVERBS = {"RB", "RBR", "RBS", "WRB"}
POS_ADJ = {"JJ", "JJR", "JJS"}
POS_PUNCT = {".", ",", ":", ";", "LRB", "RRB", "``", "''"}

_PUNCT_CHARS = "?.,:;"

# ---------------------------------------------------------------------------
# Verb lemmatizer (WordNet-morphy-flavoured; reference uses NLTK's
# WordNetLemmatizer, lexeme.py:188,272)
# ---------------------------------------------------------------------------

# Irregulars.  NOTE the reference inherits WordNet quirks: words that are
# themselves verbs stay unchanged ("saw" does NOT become "see",
# cf. ie/test/conj_test.py:70 comment) — so ambiguous forms map to themselves.
_IRREGULAR_VERBS = {
    "went": "go", "gone": "go", "goes": "go",
    "was": "be", "were": "be", "is": "be", "are": "be", "am": "be",
    "been": "be", "being": "be", "'s": "be", "'re": "be", "'m": "be",
    "has": "have", "had": "have", "having": "have", "'ve": "have",
    "does": "do", "did": "do", "done": "do", "doing": "do",
    "came": "come", "gave": "give", "given": "give", "took": "take",
    "taken": "take", "made": "make", "got": "get", "gotten": "get",
    "ran": "run", "said": "say", "told": "tell", "knew": "know",
    "known": "know", "thought": "think", "found": "find", "brought": "bring",
    "bought": "buy", "caught": "catch", "taught": "teach", "sought": "seek",
    "wrote": "write", "written": "write", "spoke": "speak", "spoken": "speak",
    "broke": "break", "broken": "break", "chose": "choose", "chosen": "choose",
    "drove": "drive", "driven": "drive", "rose": "rise", "risen": "rise",
    "grew": "grow", "grown": "grow", "threw": "throw", "thrown": "throw",
    "flew": "fly", "flown": "fly", "drew": "draw", "drawn": "draw",
    "held": "hold", "kept": "keep", "met": "meet", "paid": "pay",
    "sent": "send", "spent": "spend", "built": "build", "lost": "lose",
    "meant": "mean", "stood": "stand", "understood": "understand",
    "won": "win", "began": "begin", "begun": "begin", "sang": "sing",
    "sung": "sing", "sat": "sit", "ate": "eat", "eaten": "eat",
    "fell": "fall", "fallen": "fall", "heard": "hear", "led": "lead",
    "read": "read", "sold": "sell", "saw": "saw",  # wordnet quirk: kept
    "felt": "felt", "left": "left",                # ambiguous forms kept
    "became": "become", "wore": "wear", "worn": "wear", "swore": "swear",
    "laid": "lay", "lay": "lie", "slid": "slide", "shook": "shake",
    "shaken": "shake", "struck": "strike", "hid": "hide", "hidden": "hide",
    "forgot": "forget", "forgotten": "forget", "froze": "freeze",
    "frozen": "freeze", "arose": "arise", "arisen": "arise",
    "stole": "steal", "stolen": "steal", "seen": "see",
    "beaten": "beat", "bit": "bite", "bitten": "bite",
    "woke": "wake", "woken": "wake", "awoke": "awake", "awoken": "awake",
    "showed": "show", "shown": "show", "swollen": "swell",
    "tore": "tear", "torn": "tear", "sworn": "swear",
    "bore": "bear", "borne": "bear", "proven": "prove",
    "mistook": "mistake", "mistaken": "mistake",
    "overtook": "overtake", "overtaken": "overtake",
    "undertook": "undertake", "undertaken": "undertake",
    "rode": "ride", "ridden": "ride", "rang": "ring", "rung": "ring",
    "sprang": "spring", "sprung": "spring",
    "drank": "drink", "drunk": "drink",
    "blew": "blow", "blown": "blow",
    "sank": "sink", "sunk": "sink", "sunken": "sink",
    "shrank": "shrink", "shrunk": "shrink", "shrunken": "shrink",
    "swam": "swim", "swum": "swim", "spun": "spin", "stuck": "stick",
    "stung": "sting", "strode": "stride", "wove": "weave",
    "woven": "weave", "slew": "slay", "slain": "slay",
    "forbade": "forbid", "forbidden": "forbid",
    "crept": "creep", "swept": "sweep", "wept": "weep",
    "slept": "sleep", "fled": "flee", "fought": "fight", "dug": "dig",
    "hung": "hang", "shone": "shine", "bled": "bleed", "bred": "breed",
    "fed": "feed", "sped": "speed", "wound": "wind", "ground": "grind",
    "strung": "string", "swung": "swing", "clung": "cling",
    "flung": "fling", "stank": "stink", "stunk": "stink",
    "sewn": "sew", "mown": "mow", "lain": "lie",
}

_VOWELS = set("aeiou")
_DOUBLED = re.compile(r"([b-df-hj-np-tv-z])\1ed$|([b-df-hj-np-tv-z])\2ing$")

# prefixed irregulars resolve through their base ("overcame" → over+came)
_VERB_PREFIXES = ("over", "under", "out", "re", "mis", "fore", "with", "un")

# ablaut participle/preterite shapes; a form ending in one of these that
# is NOT in the irregular inventory is an UNKNOWN irregular — returned
# unchanged with confident=False so callers can quarantine-tag it
# instead of silently mis-stemming ("smitten", "wrought", "striven").
_ABLAUT_UNSURE = ("itten", "otten", "iven", "oven", "ozen",
                  "ought", "aught")


def lemmatize_verb(word: str) -> str:
    """Map an inflected verb form to its base form (deterministic rules)."""
    return lemmatize_verb_ex(word)[0]


def lemmatize_verb_ex(word: str):
    """(lemma, confident).  confident=False marks an ablaut-shaped form
    outside the irregular inventory — kept as-is, quarantine-taggable."""
    w = word.lower()
    out = _lemmatize_lower(w)
    if out is not None:
        return out, True
    if w.endswith(_ABLAUT_UNSURE):
        return w, False
    return w, True


def _lemmatize_lower(w: str):
    """Base form for a lowercased verb, or None when no rule applies
    (the form is presumed to already be a base form or is unknown)."""
    if w in _IRREGULAR_VERBS:
        return _IRREGULAR_VERBS[w]
    for p in _VERB_PREFIXES:
        if w.startswith(p) and w[len(p):] in _IRREGULAR_VERBS:
            base = _IRREGULAR_VERBS[w[len(p):]]
            # only when the base actually changed (else "represent" would
            # become "re"+"present" style nonsense for identity entries)
            if base != w[len(p):]:
                return p + base
    return _suffix_lemma(w)


# practical exceptions the shape rules cannot tell apart (uses/focuses,
# treat/create …)
_LEMMA_EXCEPTIONS = {
    "focuses": "focus", "dying": "die", "lying": "lie", "tying": "tie",
    "foresaw": "foresee",
}


def _undouble(stem: str) -> str:
    """stopped → stop; 'll' undoubles only for multi-syllable non-'-all'
    stems (controlled → control, compelled → compel) — monosyllables
    genuinely end in ll (call, spell, fill)."""
    if len(stem) >= 3 and stem[-1] == stem[-2] and stem[-1] not in _VOWELS:
        if stem[-1] == "s":
            return stem
        if stem[-1] == "l":
            if stem.endswith("all") or \
                    len(re.findall(r"[aeiouy]+", stem)) < 2:
                return stem
        return stem[:-1]
    return stem


def _suffix_lemma(w: str):
    hit = _LEMMA_EXCEPTIONS.get(w)
    if hit is not None:
        return hit
    if w.endswith("ies") and len(w) > 4:
        return w[:-3] + "y"
    if w.endswith(("sses", "shes", "ches", "xes", "zzes")):
        return w[:-2]
    if w.endswith("oes") and len(w) > 3:
        return w[:-2]
    if w.endswith("s") and not w.endswith(("ss", "us", "is")) and len(w) > 2:
        return w[:-1]
    if w.endswith("eed") and len(w) > 4:
        return w[:-1]                             # agreed → agree
    if w.endswith("ied") and len(w) > 4:
        return w[:-3] + "y"
    if w.endswith("ed") and len(w) > 3:
        stem = w[:-2]
        if len(stem) == 2:
            return stem + "e"                     # died → die, owed → owe
        undone = _undouble(stem)
        if undone != stem:
            return undone                         # stopped → stop
        if _needs_e(stem):
            return stem + "e"                     # believed → believe
        return stem                               # protested → protest
    if w.endswith("ing") and len(w) > 4:
        stem = w[:-3]
        if not re.search(r"[aeiouy]", stem):
            return None                           # bring/swing are bases
        undone = _undouble(stem)
        if undone != stem:
            return undone
        if _needs_e(stem):
            return stem + "e"
        return stem
    return None


# multi-syllable -ng stems whose base takes e (change/arrange vs hang/
# belong — the velar-nasal vs /ndʒ/ split is not recoverable from
# spelling, so the /ndʒ/ family is enumerated)
_NG_TAKES_E = {"chang", "arrang", "rearrang", "exchang", "challeng",
               "plung", "lung", "cring", "hing", "unhing", "reveng",
               "aveng", "scaveng", "loung", "spong", "fring", "infring",
               "imping"}  # NB "singing" must yield sing, not singe
_TAKES_E = {"creat", "recreat"}


def _needs_e(stem: str) -> bool:
    """Heuristic: CVC(e) verbs like believ-, pos-, wheez- need a trailing e."""
    if len(stem) < 2:
        return False
    if stem in _NG_TAKES_E or stem in _TAKES_E:
        return True
    if stem.endswith("v"):
        return True        # receive, serve, arrive — no English base ends v
    if stem.endswith(("dg", "ic", "ib")):
        return True        # judge, dodge; notice, practice; describe
    if stem.endswith(("in", "id")) and len(stem) > 3 \
            and stem[-3] not in _VOWELS \
            and len(re.findall(r"[aeiouy]+", stem)) >= 2:
        return True        # imagine, determine; provide, decide
    if stem.endswith(("iev", "eav", "eez", "ooz", "uc", "iz", "yz",
                      "os", "as", "is", "rs", "ov", "ors", "nc", "ud")):
        return True        # believe, oppose, praise, endorse, approve, announce
    if stem.endswith("u"):
        return True                                   # continue, argue, rescue
    n_vowel_groups = len(re.findall(r"[aeiouy]+", stem))
    # single-syllable consonant+vowel+consonant stems take 'e' (pose, rate,
    # vote); multi-syllable ones usually don't (protest, focus, deliver)
    if n_vowel_groups == 1 and re.search(r"[b-df-hj-np-tv-z][aeiou][b-df-hj-np-tvz]$", stem) \
            and not re.search(r"(ow|ay|ey|oy|aw|ew)$", stem):
        return True
    if re.search(r"[aeiou]g$", stem) and not stem.endswith("ng"):
        return True                                   # manage, arrange
    return (stem.endswith("at") and n_vowel_groups > 1) \
        or (n_vowel_groups == 1 and stem.endswith("us"))


# ---------------------------------------------------------------------------
# Word tables (parity: lexeme.py:29-138)
# ---------------------------------------------------------------------------

# pronoun → (conds builder spec, final is owner/owned)
# entry: (pred, reflexive, possessive)
_PRONOUNS = {
    "i": ("i", False, False), "me": ("i", False, False),
    "myself": ("i", True, False), "mine": ("i", False, True),
    "my": ("i", False, True),
    "you": ("you", False, False), "yourself": ("you", True, False),
    "yours": ("you", False, True), "your": ("you", False, True),
    "he": ("he", False, False), "him": ("he", False, False),
    "himself": ("he", True, False), "his": ("he", False, True),
    "she": ("she", False, False), "her": ("she", False, False),
    "herself": ("she", True, False), "hers": ("she", False, True),
    "we": ("we", False, False), "us": ("we", False, False),
    "ourselves": ("we", True, False), "ours": ("we", False, True),
    "our": ("we", False, True),
    "they": ("they", False, False), "them": ("they", False, False),
    "themselves": ("they", True, False), "theirs": ("they", False, True),
    "their": ("they", False, True),
    "it": ("it", False, False), "its": ("it", False, True),
    "itself": ("it", True, False),
}

_ADV_SPECIAL = {
    "up": ("up", "direction"), "down": ("down", "direction"),
    "left": ("left", "direction"), "right": ("right", "direction"),
}

_MONTHS = {
    "Jan": "January", "Feb": "February", "Mar": "March", "Apr": "April",
    "May": "May", "Jun": "June", "Jul": "July", "Aug": "August",
    "Sep": "September", "Sept": "September", "Oct": "October",
    "Nov": "November", "Dec": "December",
}
_WEEKDAYS = {
    "Mon": "Monday", "Tue": "Tuesday", "Tues": "Tuesday", "Wed": "Wednesday",
    "Thur": "Thursday", "Thurs": "Thursday", "Fri": "Friday",
    "Sat": "Saturday", "Sun": "Sunday",
}
_MONTH_RE = re.compile(
    r"^((Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Sept|Oct|Nov|Dec)\.?|January|February|March|April|June|July|August|September|October|November|December)$")
_WEEKDAY_RE = re.compile(
    r"^((Mon|Tue|Tues|Wed|Thur|Thurs|Fri|Sat|Sun)\.?|Monday|Tuesday|Wednesday|Thursday|Friday|Saturday|Sunday)$")

_EVENT_PREDICATES = ("_ARG0", "_ARG1", "_ARG2", "_ARG3", "_ARG4", "_ARG5")

# T4/J3: optional VerbNet class implications (reference default is
# CO_NO_VERBNET — goldens compose without; install with set_verbnet_db)
_VERBNET_DB = None


def set_verbnet_db(db) -> None:
    """Install (or clear, with None) the VerbNet DB — verb leaves then emit
    the reference's ``stem(E) ⇒ _vn_<class>(E)`` implication conditions
    (ie/semantics/lexeme.py:620-648)."""
    global _VERBNET_DB
    _VERBNET_DB = db


def _verbnet_implication(stem: str, ref) -> Optional["Rel"]:
    """Build the class implication exactly as the reference pairs it:
    one class → plain Rel; several → Or-chain, odd leftover seeded first
    (lexeme.py:624-637)."""
    from ..drt.drs import DRS, Imp, Or
    if _VERBNET_DB is None:
        return None
    vnclasses = _VERBNET_DB.classes(stem)
    if not vnclasses:
        return None
    if len(vnclasses) == 1:
        vncond = Rel("_vn_" + vnclasses[0], [ref])
    else:
        xconds = [Rel("_vn_" + vnclasses[-1], [ref])] \
            if len(vnclasses) & 0x1 else []
        for vna, vnb in zip(vnclasses[0::2], vnclasses[1::2]):
            xconds.append(Or(DRS([Rel("_vn_" + vna, [ref])]),
                             DRS([Rel("_vn_" + vnb, [ref])])))
        while len(xconds) != 1:
            c2 = xconds.pop()
            c1 = xconds.pop()
            xconds.append(Or(DRS([c1]), DRS([c2])))
        vncond = xconds[0]
    return Imp(DRS([Rel(stem, [ref])]), DRS([vncond]))

_PASS_THROUGH_WORDS = {"to", "will", "would", "can", "could", "shall",
                       "should", "may", "might", "must", "do", "does", "did",
                       "have", "has", "had", "be", "is", "are", "was", "were",
                       "am", "been", "being", "'ll", "'d", "ca", "wo", "sha"}


def strip_apostrophe_s(word: str) -> str:
    """Parity: lexeme.py:142-162."""
    if len(word) > 2:
        if word.endswith("'s"):
            return word[:-2]
        if word.endswith("’s"):
            return word.replace("’s", "")
    return word


# ---------------------------------------------------------------------------
# Ref trees
# ---------------------------------------------------------------------------

RefTree = Union[Ref, Tuple["RefTree", "RefTree"]]  # atom | (result, arg)


def tree_final(tree: RefTree) -> Ref:
    while isinstance(tree, tuple):
        tree = tree[0]
    return tree


def tree_atoms(tree: RefTree) -> List[Ref]:
    """Flatten: result atoms first, then argument atoms (matches
    Category.atoms order)."""
    if isinstance(tree, Ref):
        return [tree]
    return tree_atoms(tree[0]) + tree_atoms(tree[1])


def unify_trees(a: RefTree, b: RefTree) -> None:
    """Pairwise union of two ref trees; shape mismatch degrades to unifying
    final atoms (category coercion, e.g. N vs NP)."""
    if isinstance(a, Ref) and isinstance(b, Ref):
        a.union(b)
    elif isinstance(a, tuple) and isinstance(b, tuple):
        unify_trees(a[0], b[0])
        unify_trees(a[1], b[1])
    else:
        tree_final(a if isinstance(a, tuple) else b).union(
            b if isinstance(b, Ref) else a if isinstance(a, Ref) else tree_final(b))


def fresh_tree(cat: Category) -> RefTree:
    if cat.isatom:
        return Ref("e" if cat.is_sy else "x")
    return (fresh_tree(cat.result), fresh_tree(cat.arg))


def mirror_tree(tree: RefTree, cat: Category) -> RefTree:
    """A tree for ``cat`` reusing refs of ``tree`` pairwise (modifier share)."""
    if cat.isatom:
        return tree_final(tree)
    if isinstance(tree, tuple):
        return (mirror_tree(tree[0], cat.result), mirror_tree(tree[1], cat.arg))
    # shape mismatch: everything shares the single ref
    return (mirror_tree(tree, cat.result), mirror_tree(tree, cat.arg))


# ---------------------------------------------------------------------------
# Sem: a category + ref tree + deferred conditions
# ---------------------------------------------------------------------------

class Sem:
    __slots__ = ("cat", "tree", "conj")

    def __init__(self, cat: Category, tree: RefTree, conj: bool = False):
        self.cat = cat
        self.tree = tree
        self.conj = conj

    def final_ref(self) -> Ref:
        return tree_final(self.tree)

    def __repr__(self):
        return "Sem(%s)" % self.cat.signature


# ---------------------------------------------------------------------------
# Token record
# ---------------------------------------------------------------------------

class Token:
    """One word of a sentence with its semantic contribution."""

    __slots__ = ("idx", "word", "stem", "pos", "cat", "conds", "sem",
                 "isproper", "isverb", "ispunct", "refs", "mask",
                 "stem_unsure")

    def __init__(self, idx: int, word: str, pos: str, cat: Category):
        self.idx = idx
        self.pos = pos
        self.cat = cat
        self.mask = 0               # RT_* referent-type bits (reftypes.py)
        self.conds: List[Rel] = []
        self.sem: Optional[Sem] = None
        self.refs: List[Ref] = []
        self.isproper = pos in POS_PROPER
        self.isverb = pos in POS_VERBS or pos == "MD"
        self.ispunct = pos in POS_PUNCT or cat.ispunct

        # -- stemming (parity: lexeme.py:244-277) --
        if word == "'s" and pos != "POS" and not cat.ismodifier and \
                cat.final_atom().is_sy:
            word = "is"
        elif word == "'nt" or word == "n't":
            word = "not"
        self.word = word
        if word in _PUNCT_CHARS:
            self.stem = word
        else:
            wd = strip_apostrophe_s(word)
            if (pos in POS_NOUNS) and wd.upper() == wd:
                self.stem = word.rstrip(_PUNCT_CHARS)
            elif pos in POS_PROPER:
                if wd.upper() == wd:
                    self.stem = word.rstrip(_PUNCT_CHARS)
                else:
                    self.stem = word.title().rstrip(_PUNCT_CHARS)
            else:
                stem = word.lower().rstrip(_PUNCT_CHARS)
                if pos in POS_VERBS:
                    self.stem, confident = lemmatize_verb_ex(stem)
                    if not confident:
                        # unknown ablaut form kept as-is; callers may
                        # quarantine-tag (VERDICT r2 item 6)
                        self.stem_unsure = True
                else:
                    self.stem = stem


def _bind(ref: Ref, tok: Token):
    r = ref.find()
    r.bound = True
    if getattr(r, "bound_idx", None) is None:
        r.bound_idx = tok.idx
    if getattr(r, "binder", None) is None:
        r.binder = tok


def build_leaf_sem(tok: Token) -> Sem:
    """Create the leaf production: ref tree with sharing + conditions.

    Semantics parity: lexeme.py get_production (:486-851).
    """
    cat = tok.cat
    word_l = tok.word.lower()

    # atoms ---------------------------------------------------------------
    if cat.isatom:
        if cat.ispunct or cat.isconj:
            if cat.isconj:
                # parity: lexeme.py:509-515 (conjoins carry set-operator
                # bits and an empty DRS)
                tok.mask |= {"or": RT_UNION, "nor": RT_UNION | RT_NEGATE,
                             "and": RT_INTERSECTION}.get(word_l, 0)
            return Sem(cat, Ref("x"))
        r = Ref("e" if cat.is_sy else "x")
        if cat.isn or cat.isnp:
            if tok.pos in POS_PRONOUNS and word_l in _PRONOUNS:
                _pron_conds(tok, r)
            elif tok.isproper:
                _proper_conds(tok, r)
                _bind(r, tok)
            elif tok.pos == "CD":
                tok.mask |= RT_NUMBER
                tok.conds.append(Rel(tok.stem, [r]))
                tok.conds.append(Rel("_NUM", [r]))
                _bind(r, tok)
            else:
                tok.mask |= _noun_mask(tok)
                tok.conds.append(Rel(tok.stem, [r]))
                _bind(r, tok)
        else:
            tok.conds.append(Rel(tok.stem, [r]))
            if cat.is_sy:
                _bind(r, tok)
        tok.refs = [r]
        return Sem(cat, r)

    # functors ------------------------------------------------------------
    tree = _leaf_tree(cat, tok)
    slots, final = _peel_refs(cat, tree)
    refs = _dedup_refs([final] + slots)
    tok.refs = refs

    final_atom = cat.final_atom()

    # determiner / NP-N coercion: empty for articles
    if cat.result.isnp and cat.arg.isn and cat.isarg_right:
        if tok.pos in POS_PRONOUNS and word_l in _PRONOUNS:
            _pron_conds(tok, final)
        elif word_l in ("a", "an", "the", "thy"):
            pass
        elif tok.pos == "DT":
            pass  # demonstratives contribute nothing to triples
        else:
            tok.conds.append(Rel(tok.stem, [final]))
        return Sem(cat, tree)

    # quotative inversion "S, said NP" — (S\S)/NP with verbal POS: the
    # sayer NP heads a FRESH say event; the quoted clause passes through
    # with its own event untouched (web-news attribution; without this
    # the modifier's pairwise ref share folds _ARG0(sayer) into the
    # MAIN event and the sayer steals the quoted verb's subject)
    if tok.isverb and cat.isarg_right and cat.arg.isatom \
            and cat.arg.isnp and cat.result.isfunctor \
            and cat.result.ismodifier and cat.result.result.isatom \
            and cat.result.result.is_sy:
        e = Ref("e")
        tok.mask |= RT_EVENT
        tok.conds.append(Rel(tok.stem, [e]))
        tok.conds.append(Rel("_EVENT", [e]))
        tok.conds.append(Rel("_ARG0", [e, refs[-1]]))
        tok.refs = [e, refs[-1]]
        return Sem(cat, tree)

    # possessive clitic 's: (NP[nb]/N)\NP — _POSS(owner, owned)
    if tok.pos == "POS":
        tok.mask |= RT_POSSESSIVE    # parity: lexeme.py:822-823
        owner = refs[-1] if len(refs) > 1 else Ref("x")
        tok.conds.append(Rel("_POSS", [owner, final]))
        return Sem(cat, tree)

    # wh-words: the pronoun names the extraction GAP — the NP argument of
    # the clausal complement (What → what(X) where X is the missing object)
    if tok.pos in ("WP", "WDT") and cat.arg.isfunctor \
            and cat.arg.arg.isatom and isinstance(tree, tuple) \
            and isinstance(tree[1], tuple):
        gap = tree_final(tree[1][1])
        tok.conds.append(Rel(tok.stem, [gap]))
        gap.find().binder = tok
        return Sem(cat, tree)

    if tok.isverb and final_atom.is_sy:
        _verb_conds(tok, refs, cat)
        return Sem(cat, tree)

    if tok.pos in POS_PRONOUNS and word_l in _PRONOUNS:
        _pron_conds(tok, final)
        return Sem(cat, tree)

    if tok.pos in POS_ADVERBS or cat.ismodifier or _returns_modifier(cat):
        if tok.stem in _ADV_SPECIAL and final.kind == "e":
            w, extra = _ADV_SPECIAL[tok.stem]
            tok.mask |= RT_EVENT_ATTRIB
            if tok.stem in ADV_LOCATION:
                tok.mask |= RT_LOCATION   # parity: __adv table
            tok.conds.append(Rel(w, [final]))
            tok.conds.append(Rel(extra, [final]))
        elif tok.pos in ("IN", "TO", "POS") and len(refs) > 1:
            # noun/VP-attached preposition: pred(head, obj)
            tok.mask |= RT_PP
            tok.conds.append(Rel(tok.stem, [refs[0], refs[-1]]))
        elif tok.pos == "CD":
            tok.mask |= RT_NUMBER
            tok.conds.append(Rel(tok.stem, [refs[0]]))
            tok.conds.append(Rel("_NUM", [refs[0]]))
        else:
            # adjective on a noun head vs adverb on an event (parity:
            # lexeme.py:799-804 RT_ATTRIBUTE, :666 RT_EVENT_ATTRIB)
            tok.mask |= (RT_EVENT_ATTRIB if final.find().kind == "e"
                         else RT_ATTRIBUTE)
            tok.conds.append(Rel(tok.stem, [refs[0]]))
        return Sem(cat, tree)

    # PP-returning preposition: ref shared with NP (golden: to(X2))
    if final_atom == Category.parse("PP"):
        tok.mask |= RT_PP
        tok.conds.append(Rel(tok.stem, [final]))
        return Sem(cat, tree)

    if tok.isproper:
        _proper_conds(tok, final)
        _bind(final, tok)
        return Sem(cat, tree)

    if tok.pos == "CD":
        tok.mask |= RT_NUMBER
        tok.conds.append(Rel(tok.stem, [final]))
        tok.conds.append(Rel("_NUM", refs))
        _bind(final, tok)
        return Sem(cat, tree)

    if final_atom.isn or final_atom.isnp:
        tok.mask |= _noun_mask(tok)
        tok.conds.append(Rel(tok.stem, [final]))
        _bind(final, tok)
        return Sem(cat, tree)

    # infinitival "to" and bare auxiliaries: event passes through, no conds
    # (parity: CAT_INFINITIVE branch, lexeme.py:824-829)
    if word_l in _PASS_THROUGH_WORDS and _is_pass_through_cat(cat):
        return Sem(cat, tree)

    tok.conds.append(Rel(tok.stem, [refs[0]]))
    return Sem(cat, tree)


def _returns_modifier(cat: Category) -> bool:
    c = cat
    while c.isfunctor:
        if c.ismodifier:
            return True
        c = c.result
    return False


def _noun_mask(tok: Token) -> int:
    """Noun classification bits (parity: _set_noun_mask,
    lexeme.py:474-484)."""
    if tok.pos == "CD":
        return RT_NUMBER
    if tok.isproper:
        return RT_PROPERNAME
    if tok.pos in ("NNS", "NNPS"):
        return RT_ENTITY | RT_PLURAL
    return RT_ENTITY


def _pron_conds(tok: Token, final: Ref):
    tok.mask |= PRONOUN_MASK.get(tok.word.lower(), RT_ANAPHORA)
    pred, reflex, poss = _PRONOUNS[tok.word.lower()]
    if poss:
        owner = Ref("x")
        owner.binder = tok
        tok.conds.append(Rel(pred, [owner]))
        tok.conds.append(Rel("_POSS", [owner, final]))
    else:
        tok.conds.append(Rel(pred, [final]))
        final.find().binder = tok
    if reflex:
        tok.conds.append(Rel("_REFLEX", [final]))


def _proper_conds(tok: Token, final: Ref):
    if _MONTH_RE.match(tok.stem):
        tok.mask |= RT_DATE          # parity: lexeme.py:389-390
        tok.conds.append(Rel(_MONTHS.get(tok.stem, tok.stem), [final]))
        tok.conds.append(Rel("_DATE", [final]))
    elif _WEEKDAY_RE.match(tok.stem):
        tok.mask |= RT_DATE          # parity: lexeme.py:399-400
        tok.conds.append(Rel(_WEEKDAYS.get(tok.stem, tok.stem), [final]))
        tok.conds.append(Rel("_DATE", [final]))
    else:
        tok.mask |= RT_PROPERNAME
        tok.conds.append(Rel(tok.stem, [final]))


def _verb_conds(tok: Token, refs: List[Ref], cat: Category):
    """Event conditions: stem(E), _EVENT(E), _ARGn(E, argref).

    Parity: lexeme.py:617-744 (the no-verbnet path, CO_NO_VERBNET default).
    """
    word_l = tok.word.lower()
    final = refs[0]
    if tok.pos == "MD" or (word_l in _PASS_THROUGH_WORDS and _is_pass_through_cat(cat)):
        if tok.pos == "MD":
            tok.mask |= RT_EVENT_MODAL   # parity: lexeme.py:684
            tok.conds.append(Rel(tok.stem, [final]))
            tok.conds.append(Rel("_MODAL", [final]))
        else:
            # auxiliaries contribute no conditions (event passes through)
            # but still classify as modal-ish event tokens so VP phrase
            # selection spans "would have been" whole (nominal goldens,
            # number_test.py:43-49)
            tok.mask |= RT_EVENT_MODAL
        return
    has_verbal_comp = False
    c = cat
    while c.isfunctor:
        if c.arg.isfunctor and c.arg.final_atom().is_sy:
            has_verbal_comp = True
        c = c.result
    if word_l in ("do", "does", "did") and has_verbal_comp:
        # do-support (question inversion): no conditions; the event ref was
        # already unified with the verbal complement in _leaf_tree
        return
    tok.mask |= RT_EVENT             # parity: lexeme.py:656,695
    tok.conds.append(Rel(tok.stem, [final]))
    vn = _verbnet_implication(tok.stem, final)
    if vn is not None:
        # the stem Rel stays asserted (triples read it); the implication
        # adds the reference's _vn_<class> output mode on top
        tok.conds.append(vn)
    tok.conds.append(Rel("_EVENT", [final]))
    for pred, r in zip(_EVENT_PREDICATES, refs[1:]):
        tok.conds.append(Rel(pred, [final, r]))
    _bind(final, tok)


def _is_pass_through_cat(cat: Category) -> bool:
    """True for shapes like (S[to]\\NP)/(S[b]\\NP) — result ≅ argument.

    S[adj] complements are excluded: copular "is happy" keeps its own event
    with the attribute as _ARG1 (parity: CAT_COPULAR branch, lexeme.py:683).
    """
    return (cat.isfunctor and cat.arg.isfunctor
            and cat.result.strip_features() == cat.arg.strip_features()
            and "adj" not in cat.arg.final_atom().features)


def _leaf_tree(cat: Category, tok: Token) -> RefTree:
    """Build the leaf's ref tree with sharing (see module docstring)."""
    env = {}

    def atom_ref(c: Category) -> Ref:
        if c.tag is not None and c.tag in env:
            return env[c.tag]
        r = Ref("e" if c.is_sy else "x")
        if c.tag is not None:
            env[c.tag] = r
        return r

    def build(c: Category) -> RefTree:
        if c.isatom:
            return atom_ref(c)
        rt = build(c.result)
        # modifier / pass-through: mirror argument over result
        if c.ismodifier or (tok.word.lower() in _PASS_THROUGH_WORDS
                            and c.result.strip_features() == c.arg.strip_features()
                            and "adj" not in c.arg.final_atom().features):
            return (rt, mirror_tree(rt, c.arg))
        # determiner / NP-N coercion and PP/NP prepositions share the ref;
        # complementizers (S[em]/S[dcl] "that") pass the clause event through
        if c.arg.isatom and isinstance(rt, Ref):
            rshape = c.result
            if (rshape.isnp and c.arg.isn) or (rshape.isn and c.arg.isnp) \
                    or (rshape.base == "PP" and c.arg.isnp) \
                    or (rshape.base == "PP" and c.arg.base == "PP") \
                    or (rshape.isatom and rshape.base == "S"
                        and c.arg.base == "S"):
                return (rt, rt)
        at = build(c.arg)
        return (rt, at)

    tree = build(cat)
    _apply_control_sharing(cat, tree)
    if tok.word.lower() in ("do", "does", "did"):
        # do-support: the auxiliary's clause event IS its verbal
        # complement's event (question inversion, negation)
        c, t = cat, tree
        while c.isfunctor and isinstance(t, tuple):
            if c.arg.isfunctor and c.arg.final_atom().is_sy:
                tree_final(t[1]).union(tree_final(tree))
                break
            c, t = c.result, t[0]
    return tree


def _apply_control_sharing(cat: Category, tree: RefTree):
    """Share the NP of an S-complement with the verb's object (if one is
    applied first) else its subject — subject/object control.

    Parity: templates ``(S[dcl]\\NP_118)/(S[to]_119\\NP_118)`` (subject
    control) and ``((S\\NP)/(S[to]\\NP))/NP`` (object control) in
    functor_templates.dat.
    """
    # peel arguments outermost-first, remembering (cat, tree) pairs
    args = []
    c, t = cat, tree
    while c.isfunctor and isinstance(t, tuple):
        args.append((c.arg, t[1], c.slash))
        c, t = c.result, t[0]
    # find plain NP args and S-complement args
    subj_np = None
    for ac, at, slash in args:
        if ac.isatom and ac.isnp and slash == "\\":
            subj_np = tree_final(at)
    for i, (ac, at, _) in enumerate(args):
        if ac.isfunctor and ac.final_atom().is_sy and ac.arg.isnp \
                and isinstance(at, tuple):
            comp_np = tree_final(at[1])
            # already shared (mirror/pass-through or explicit predarg tags):
            # the template has spoken — don't override it
            outside_ids = set()
            for j, (jc, jt, _s) in enumerate(args):
                if j != i:
                    outside_ids.update(id(r.find()) for r in tree_atoms(jt))
            outside_ids.update(id(r.find()) for r in tree_atoms(t))
            if id(comp_np.find()) in outside_ids or \
                    id(tree_final(at[0]).find()) in outside_ids:
                continue
            # object NPs applied before (i.e. appearing earlier in args list)
            controller = None
            for j in range(0, i):
                jc, jt, jslash = args[j]
                if jc.isatom and jc.isnp and jslash == "/":
                    controller = tree_final(jt)
            if controller is None:
                controller = subj_np
            if controller is None and cat.final_atom().isnp:
                # relative pronoun (NP\NP)/(S\NP): the clause's missing NP
                # is the modified head noun
                controller = tree_final(t)
            if controller is not None:
                comp_np.union(controller)


def _peel_refs(cat: Category, tree: RefTree):
    """refs in the reference's order: [final] + reversed(left args) + right
    args (lexeme.py:592-607)."""
    lstk, rstk = [], []
    c, t = cat, tree
    while c.isfunctor and isinstance(t, tuple):
        atoms = tree_atoms(t[1])
        if c.isarg_left:
            lstk.extend(atoms)
        else:
            rstk.extend(atoms)
        c, t = c.result, t[0]
    final = tree_final(t)
    return list(reversed(lstk)) + rstk, final


def _dedup_refs(refs: List[Ref]) -> List[Ref]:
    seen, out = set(), []
    for r in refs:
        rr = r.find()
        if id(rr) not in seen:
            seen.add(id(rr))
            out.append(rr)
    return out
