"""Relational + beyond-reference operators (SURVEY §2.3–§2.7, §7 step 9)."""
