from .sequences import (
    sequences_from_csv,
    sequences_from_documents,
    sequences_from_jsonl,
    sequences_table_from_documents,
    synthetic_sequences_dataset,
    synthetic_sequences_table,
    write_synthetic_sequences,
)
