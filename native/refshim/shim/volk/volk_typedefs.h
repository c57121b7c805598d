// Stub: nothing from volk_typedefs.h is used by the compiled oracle set.
#pragma once
