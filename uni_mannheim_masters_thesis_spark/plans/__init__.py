from .flagship import flagship_polysemy  # noqa: F401
