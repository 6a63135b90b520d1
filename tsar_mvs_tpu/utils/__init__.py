"""I/O codecs, scene readers, synthetic data, profiling helpers."""
