from .engine import Composer, SentenceSem, ComposeError
from .lexicon import Token, Sem, lemmatize_verb

__all__ = ["Composer", "SentenceSem", "ComposeError", "Token", "Sem",
           "lemmatize_verb"]
