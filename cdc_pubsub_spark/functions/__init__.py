"""Scalar function surface (string/regex/date/math/array/map/json) and UDFs."""
