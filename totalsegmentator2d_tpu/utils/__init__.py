from . import colors, config, files, logging, params, temp  # noqa: F401
