from .controls import ControlSet  # noqa: F401
from .game import Game  # noqa: F401
