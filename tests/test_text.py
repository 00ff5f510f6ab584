"""preprocess_sentence / segmentation contract tests (M2/M1).

Expected strings are the behavior of the reference's regex chain
(ie/utils/text.py:17-43) as transcribed — order-sensitive; these act as
snapshot tests so any refactor that changes tokenization is caught.
"""

from ie_ray.nlp.text import (preprocess_sentence, split_paragraphs,
                             split_sentences)


def test_clitic_splitting():
    assert preprocess_sentence("John's book is red.") == "John 's book is red"
    assert preprocess_sentence("It's Dr. Smith's plan.") == \
        "It 's Dr. Smith 's plan"


def test_currency_spacing():
    assert preprocess_sentence("The firm paid $100 yesterday.") == \
        "The firm paid $ 100 yesterday"


def test_unicode_quotes():
    assert preprocess_sentence("He said “hello” loudly.") == \
        'He said " hello " loudly'


def test_plural_possessive_and_s_final_period():
    assert preprocess_sentence("The boys' team lost.") == \
        "The boys ' team lost"
    # s-final words keep a detached period (reference _SQ rule fires first)
    assert preprocess_sentence("A sentence  with   spaces.") == \
        "A sentence with spaces ."


def test_whitespace_collapse_and_final_period_strip():
    assert preprocess_sentence("They met   today.") == "They met today"


def test_segmentation_abbreviation_guard():
    assert split_sentences(
        "First sentence. Second one! Dr. Smith arrived. The end") == \
        ["First sentence.", "Second one!", "Dr. Smith arrived.", "The end"]


def test_paragraph_split_drops_empties():
    assert split_paragraphs("a\n\n  \nb\nc") == ["a", "b", "c"]


def test_fast_path_identical():
    """The trigger fast path must be byte-identical to the full rule chain
    — including _SQ's `.?$` quirk (final-period padding after -s words)."""
    import ie_ray.nlp.text as T

    class _Always:
        def search(self, s):
            return True

    pool = ["Hello world.", "No triggers here", "A  double  space here.",
            "The law suspends 40 plans.", "Axis.", "s.", ".", "", "Mass .",
            "The U.S.'s plan, frankly, won't work — he said “so”.",
            "Costs $5.20 now.", "boys' toys.", "it's fine.",
            "Years like 1999.", "The mayor visits the farms."]
    orig = T._TRIGGER
    try:
        T._TRIGGER = _Always()
        full = [T.preprocess_sentence(s) for s in pool]
    finally:
        T._TRIGGER = orig
    fast = [T.preprocess_sentence(s) for s in pool]
    assert full == fast
