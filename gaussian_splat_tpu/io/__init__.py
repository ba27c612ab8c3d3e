"""Scene I/O: PLY reading/writing in the 3DGS convention."""
