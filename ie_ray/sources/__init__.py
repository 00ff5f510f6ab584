from .html import extract_text
from .pages import synthesize_pages, golden_sentences, write_fixture_tables

__all__ = ["extract_text", "synthesize_pages", "golden_sentences",
           "write_fixture_tables"]
