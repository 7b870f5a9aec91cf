from . import host_ec  # noqa: F401
