from reseek_tpu.data.tables import Tables, get_tables

__all__ = ["Tables", "get_tables"]
