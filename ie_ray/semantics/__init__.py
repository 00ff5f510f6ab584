from .engine import Composer, ComposeOptions, SentenceSem, ComposeError
from .lexicon import Token, Sem, lemmatize_verb

__all__ = ["Composer", "ComposeOptions", "SentenceSem", "ComposeError",
           "Token", "Sem", "lemmatize_verb"]
