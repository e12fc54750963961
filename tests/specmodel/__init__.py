"""Independent format spec models — TEST ORACLES ONLY.

Every module in this package is a from-scratch, pure-Python transcription of
the *format-determining algorithms* of the reference (kanzi-go v2.5.1,
bitstream version 6), written directly from the Go sources cited in each
docstring. They are deliberately slow and literal: their only job is to
produce the exact bytes the reference would produce, independently of the
kanzi_tpu implementation under test (which is C++ and was written
separately). A bug would have to be made twice, in two languages, from two
readings of the spec, to slip through.

Nothing in here may import from kanzi_tpu.
"""
