"""Operator library: every data operation the reference performs,
re-expressed as lazy DataFrame algebra, plus the relational /
streaming / LLM-pipeline generalizations the fixtures exercise."""
