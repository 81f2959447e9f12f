"""Operators: validation/audit (validate, report), corpus dedup (dedup),
similarity search (similarity), multimodal plumbing (multimodal)."""
