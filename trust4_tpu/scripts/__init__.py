"""Post-analysis utilities (reference: scripts/, L8 of the layer map)."""
