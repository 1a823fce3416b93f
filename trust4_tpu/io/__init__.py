from trust4_tpu.io.fastx import FastxRecord, read_fastx

__all__ = ["FastxRecord", "read_fastx"]
