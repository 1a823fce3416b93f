"""Pipeline stages: extract -> assemble -> annotate -> report."""
