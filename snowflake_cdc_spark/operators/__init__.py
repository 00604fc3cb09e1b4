"""Relational + CDC + north-star operators, all DataFrame-level."""
