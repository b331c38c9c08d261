"""Pure timestamp kernels: unit conversion, parsing, formatting, ruby→java
format conversion, and the 4x4 cast matrix. No Ray imports here."""
