from . import dims, star, warehouse  # noqa: F401
