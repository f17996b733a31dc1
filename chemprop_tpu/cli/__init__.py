from chemprop_tpu.cli.main import construct_parser, main

__all__ = ["construct_parser", "main"]
