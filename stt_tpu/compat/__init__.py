# Compatibility bridges to reference-format artifacts.
