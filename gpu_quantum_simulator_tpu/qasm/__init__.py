from .parser import parse_qasm, parse_qasm_file

__all__ = ["parse_qasm", "parse_qasm_file"]
