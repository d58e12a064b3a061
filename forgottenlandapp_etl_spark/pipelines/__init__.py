from .routes import ETLPipelines  # noqa: F401
