from .readers import Catalog, read_csv_permissive, read_parquet_table
from .xml_records import read_xml_records

__all__ = ["Catalog", "read_csv_permissive", "read_parquet_table", "read_xml_records"]
