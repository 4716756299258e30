"""End-to-end pipeline assembly and checkpoint/resume."""
