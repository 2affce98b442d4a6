from .main import arg_parser, main

__all__ = ["arg_parser", "main"]
