// Equivalent of the cmake-generated version.cpp (reference: src/CMakeModules/version.cmake).
char const* RTL_AIRBAND_VERSION = "golden-refbuild";
