"""Reusable operator library.

Each module re-expresses one family from the reference's operator inventory
(SURVEY.md §2) as declarative DataFrame transformations — Column-expression
first so Catalyst can push down/prune/reorder; pandas UDFs only where the
built-ins genuinely cannot express the semantics.
"""
