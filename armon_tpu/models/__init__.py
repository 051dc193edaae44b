from .cases import (
    TestCase, Sod, SodY, SodCirc, Bizarrium, Sedov, DebugIndexes,
    test_from_name, BC, InitTwoState,
)
