/* Empty placeholder: output.cpp includes <ogg/ogg.h> but uses no ogg symbols. */
#ifndef SHIM_OGG_H
#define SHIM_OGG_H
#endif
