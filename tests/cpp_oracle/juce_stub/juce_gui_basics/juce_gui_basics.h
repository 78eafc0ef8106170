#pragma once
#include "../juce_stub_core.h"
