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
