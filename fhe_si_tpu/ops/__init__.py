from . import crt, limbs, modular, ntt  # noqa: F401
