from scenelib2_tpu.io.pgm import read_pgm, write_pgm
from scenelib2_tpu.io.sequence import ImageSequence

__all__ = ["read_pgm", "write_pgm", "ImageSequence"]
