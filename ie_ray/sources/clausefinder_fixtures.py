"""Non-fixture test sentences for the real parser path (T1).

The sentence pool is quoted from the reference's own clause-extraction
test corpus (``/root/reference/data/clausefinder_test.txt`` — the same
golden-quoting pattern as the CCGBANK derivations in
``tests/test_compose_goldens.py``).  None of these sentences exist in the
replay corpus, so every derivation they produce comes from the CKY
parser (``ie_ray/ccg/parser.py``).

``GOLDEN_TRIPLES`` are this engine's expected (subj, pred, obj) arg
triples for the subset with unambiguous clause structure — the P/R ≥ 0.8
gate from the round-1 verdict is tested against these.
"""

CLAUSEFINDER_SENTENCES = [
    "Albert Einstein died.",
    "Albert Einstein remained in Princeton.",
    "Albert Einstein is smart.",
    "Albert Einstein has won the Nobel Prize.",
    "RSAS gave Albert Einstein the Nobel Prize.",
    "The doorman showed Albert Einstein to his office.",
    "Albert Einstein declared the meeting open.",
    "Albert Einstein died in Princeton in 1955.",
    "Albert Einstein remained in Princeton until his death.",
    "Albert Einstein is a scientist of the 20th century.",
    "Albert Einstein has won the Nobel Prize in 1921.",
    "In 1921, Albert Einstein has won the Nobel Prize.",
    "Bell, a telecommunication company , which is based in Los Angeles , "
    "makes and distributes electronic , computer and building products.",
    "He says that you like to swim.",
    "He says you like to swim.",
    "The boss said to start digging.",
    "We started digging.",
    "The important thing is to keep calm.",
    "The problem is that this has never been tried.",
    "How much does it cost to join World Resorts International.",
    "Sue asked George to respond to her offer.",
    "The guy , John said , left early in the morning.",
    "The guy John said left early in the morning.",
    "The convention named Dogbreath Vice President to keep him happy.",
    "Reagan has died.",
    "He should leave.",
    "Do you think that he will have left when we come.",
]

# expected arg-kind triples for the structurally unambiguous subset
GOLDEN_TRIPLES = {
    "Albert Einstein died.": {("Albert-Einstein", "die", None)},
    "Albert Einstein remained in Princeton.":
        {("Albert-Einstein", "remain", None)},
    "Albert Einstein is smart.": {("Albert-Einstein", "be", "smart")},
    "Albert Einstein has won the Nobel Prize.":
        {("Albert-Einstein", "win", "Nobel-Prize")},
    "Albert Einstein has won the Nobel Prize in 1921.":
        {("Albert-Einstein", "win", "Nobel-Prize")},
    "Albert Einstein is a scientist of the 20th century.":
        {("Albert-Einstein", "be", "scientist")},
    "The doorman showed Albert Einstein to his office.":
        {("doorman", "show", "Albert-Einstein")},
    "Reagan has died.": {("Reagan", "die", None)},
    "He should leave.": {("he", "leave", None)},
    "We started digging.": {("we", "start", "dig"), ("we", "dig", None)},
    "He says you like to swim.":
        {("he", "say", "like"), ("you", "like", "swim"),
         ("you", "swim", None)},
}
