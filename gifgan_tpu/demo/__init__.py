from gifgan_tpu.demo.paths import (EXPRESSIONS, make_expression_paths,
                                   write_paths)

__all__ = ["EXPRESSIONS", "make_expression_paths", "write_paths"]
