from .kg import kg_triples, kg_full, default_fixture_dir

__all__ = ["kg_triples", "kg_full", "default_fixture_dir"]
