"""Console entry points (reference ``pyproject.toml:18-20`` registers
``caipy_to_fiftyone`` and its alias ``c2f``)."""
