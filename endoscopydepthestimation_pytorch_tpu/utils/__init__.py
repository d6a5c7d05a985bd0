from . import plyio  # noqa: F401
