"""Reusable workflow operators (SURVEY.md §7.1 `ops/`).

Each module is DataFrame-in / DataFrame-out and uses only declarative
DataFrame expressions (windows, higher-order functions) so Catalyst keeps
full visibility — no RDDs, no per-partition Python except where explicitly
noted (multimodal decode stubs).
"""
