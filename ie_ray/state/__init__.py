"""Shared-state helpers: broadcast objects and per-worker singletons."""

from .broadcast import broadcast, resolve

__all__ = ["broadcast", "resolve"]
