"""DRS referent-type bitmask (RT_*) — the reference's per-lexeme 64-bit
classification field (parity: ie/core/constants.py:8-46) driving phrase
selection (`select_phrases`, ie/semantics/ccg.py:1271-1338) and the
nominal views.  Bit values are kept identical so masks serialize
compatibly into the triples/lexeme tables.
"""

RT_PROPERNAME = 0x0000000000000001
RT_ENTITY = 0x0000000000000002
RT_EVENT = 0x0000000000000004
RT_LOCATION = 0x0000000000000008
RT_DIRECTION = 0x0000000000000010
RT_DATE = 0x0000000000000020
RT_WEEKDAY = 0x0000000000000040
RT_MONTH = 0x0000000000000080
RT_HUMAN = 0x0000000000000100
RT_ANAPHORA = 0x0000000000000200
RT_NUMBER = 0x0000000000000400
RT_UNION = 0x0000000000000800
RT_NEGATE = 0x0000000000001000
RT_INTERSECTION = 0x0000000000002000
RT_EVENT_ATTRIB = 0x0000000000004000
RT_EVENT_MODAL = 0x0000000000008000
RT_ATTRIBUTE = 0x0000000000010000
RT_ADJUNCT = 0x0000000000020000
RT_PP = 0x0000000000040000

RT_RELATIVE = 0x8000000000000000
RT_PLURAL = 0x4000000000000000
RT_MALE = 0x2000000000000000
RT_FEMALE = 0x1000000000000000
RT_1P = 0x0800000000000000
RT_2P = 0x0400000000000000
RT_3P = 0x0200000000000000
RT_ORPHANED = 0x0100000000000000
RT_EMPTY_DRS = 0x0080000000000000
RT_POSSESSIVE = 0x0040000000000000

# Pronoun property masks (parity: lexeme.py:29-76 __pron table).  Keyed
# by surface form; derived person/gender/number bits match row-for-row.
_P1 = RT_HUMAN | RT_1P
_P2 = RT_HUMAN | RT_2P
_P3M = RT_HUMAN | RT_MALE | RT_ANAPHORA | RT_3P
_P3F = RT_HUMAN | RT_FEMALE | RT_ANAPHORA | RT_3P
_PL1 = RT_HUMAN | RT_PLURAL | RT_1P
_PL3 = RT_HUMAN | RT_PLURAL | RT_3P

PRONOUN_MASK = {
    "i": _P1, "me": _P1, "myself": _P1,
    "mine": _P1 | RT_POSSESSIVE, "my": _P1 | RT_POSSESSIVE,
    "you": _P2, "yourself": _P2, "yours": _P2,
    "your": _P2 | RT_POSSESSIVE,
    "he": _P3M, "him": _P3M, "himself": _P3M, "hisself": _P3M,
    "his": _P3M | RT_POSSESSIVE,
    "she": _P3F, "her": _P3F, "herself": _P3F,
    "hers": _P3F | RT_POSSESSIVE,
    "we": _PL1, "us": _PL1, "ourself": _PL1, "ourselves": _PL1,
    "ours": _PL1 | RT_POSSESSIVE, "our": _PL1 | RT_POSSESSIVE,
    "yourselves": RT_HUMAN | RT_PLURAL | RT_2P,
    "they": _PL3, "them": _PL3, "themself": _PL3, "themselves": _PL3,
    "theirs": _PL3 | RT_POSSESSIVE, "their": _PL3 | RT_POSSESSIVE,
    "it": RT_ANAPHORA | RT_3P,
    "its": RT_ANAPHORA | RT_3P | RT_POSSESSIVE,
    "itself": RT_ANAPHORA | RT_3P,
}

# Directional adverbs carry a location bit (parity: __adv table,
# lexeme.py:79-89).
ADV_LOCATION = {"up", "down", "left", "right"}
