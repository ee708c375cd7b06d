from .checkpoint import (  # noqa: F401
    Manifest, completed_parts, read_manifest_entries, write_manifest_entry,
    write_plan, read_plan,
)
