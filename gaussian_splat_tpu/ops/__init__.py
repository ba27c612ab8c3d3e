"""Core rendering ops: SH evaluation, EWA projection, tile binning, rasterization."""
