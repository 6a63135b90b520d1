"""Model-level pipelines: PatchMatch MVS engine, TSAR refinement, fusion."""
