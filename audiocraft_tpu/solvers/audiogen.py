"""AudioGen solver: MusicGenSolver over the SOUND dataset
(`audiocraft/solvers/audiogen.py:10-19`)."""
from .musicgen import MusicGenSolver


class AudioGenSolver(MusicGenSolver):
    DATASET_TYPE = "sound"
