from .text import preprocess_sentence, split_sentences, split_paragraphs

__all__ = ["preprocess_sentence", "split_sentences", "split_paragraphs"]
