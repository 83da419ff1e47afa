"""Device compute ops: the fused georeference chain and the regrid kernel.

These are the two hot paths of the framework (reference call stacks 3.1/3.2 in
SURVEY.md). Everything is jit-compiled; batching is a vmap over frames.
"""
