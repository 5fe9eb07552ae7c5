from . import profiler, signals  # noqa: F401


def apply_platform_env() -> None:
    """Honor JAX_PLATFORMS even when a pre-registered platform plugin wins
    over the env var (observed with tunneled TPU backends): re-assert the
    user's choice through jax.config before any backend initializes.  Called
    by CLI entry points."""
    import os

    plat = os.environ.get("JAX_PLATFORMS", "")
    if plat:
        try:
            import jax

            jax.config.update("jax_platforms", plat)
        except Exception:
            pass
