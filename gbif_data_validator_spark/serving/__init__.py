from .http_server import ValidationServer

__all__ = ["ValidationServer"]
