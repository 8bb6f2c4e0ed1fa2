select tmp, all
color br0, tmp
select tmp, resi 1-2
color br0, tmp
select tmp, resi 3-3
color br9, tmp
select tmp, resi 4-4
color br5, tmp
select tmp, resi 5-5
color br7, tmp
select tmp, resi 6-6
color br3, tmp
select tmp, resi 7-7
color br9, tmp
select tmp, resi 8-8
color br7, tmp
select tmp, resi 9-10
color br9, tmp
select tmp, resi 11-11
color br5, tmp
select tmp, resi 12-12
color br9, tmp
select tmp, resi 13-13
color br4, tmp
select tmp, resi 14-14
color br7, tmp
select tmp, resi 15-15
color br5, tmp
select tmp, resi 16-16
color br9, tmp
select tmp, resi 17-17
color br4, tmp
select tmp, resi 18-18
color br3, tmp
select tmp, resi 19-20
color br4, tmp
select tmp, resi 21-21
color br6, tmp
select tmp, resi 22-22
color br4, tmp
select tmp, resi 23-23
color br9, tmp
select tmp, resi 24-24
color br6, tmp
select tmp, resi 25-25
color br4, tmp
select tmp, resi 26-26
color br6, tmp
select tmp, resi 27-27
color br9, tmp
select tmp, resi 28-28
color br8, tmp
select tmp, resi 29-31
color br6, tmp
select tmp, resi 32-33
color br9, tmp
select tmp, resi 34-34
color br7, tmp
select tmp, resi 35-35
color br4, tmp
select tmp, resi 36-36
color br8, tmp
select tmp, resi 37-37
color br7, tmp
select tmp, resi 38-38
color br9, tmp
select tmp, resi 39-39
color br7, tmp
select tmp, resi 40-40
color br8, tmp
select tmp, resi 41-41
color br9, tmp
select tmp, resi 42-42
color br7, tmp
select tmp, resi 43-43
color br9, tmp
select tmp, resi 44-44
color br7, tmp
select tmp, resi 45-45
color br6, tmp
select tmp, resi 46-46
color br4, tmp
select tmp, resi 47-48
color br9, tmp
select tmp, resi 49-49
color br6, tmp
select tmp, resi 50-51
color br8, tmp
select tmp, resi 52-52
color br5, tmp
select tmp, resi 53-53
color br8, tmp
select tmp, resi 54-54
color br6, tmp
select tmp, resi 55-55
color br8, tmp
select tmp, resi 56-56
color br4, tmp
select tmp, resi 57-57
color br8, tmp
select tmp, resi 58-58
color br7, tmp
select tmp, resi 59-59
color br9, tmp
select tmp, resi 60-60
color br4, tmp
select tmp, resi 61-61
color br6, tmp
select tmp, resi 62-62
color br7, tmp
select tmp, resi 63-63
color br9, tmp
select tmp, resi 64-64
color br8, tmp
select tmp, resi 65-65
color br9, tmp
select tmp, resi 66-66
color br7, tmp
select tmp, resi 67-67
color br6, tmp
select tmp, resi 68-68
color br9, tmp
select tmp, resi 69-69
color br7, tmp
select tmp, resi 70-70
color br8, tmp
select tmp, resi 71-71
color br4, tmp
select tmp, resi 72-72
color br6, tmp
select tmp, resi 73-73
color br5, tmp
select tmp, resi 74-76
color br8, tmp
select tmp, resi 77-78
color br6, tmp
select tmp, resi 79-79
color br8, tmp
select tmp, resi 80-80
color br9, tmp
select tmp, resi 81-81
color br6, tmp
select tmp, resi 82-82
color br8, tmp
select tmp, resi 83-83
color br6, tmp
select tmp, resi 84-84
color br9, tmp
select tmp, resi 85-85
color br4, tmp
select tmp, resi 86-86
color br9, tmp
select tmp, resi 87-87
color br4, tmp
select tmp, resi 88-88
color br7, tmp
select tmp, resi 89-90
color br6, tmp
select tmp, resi 91-92
color br5, tmp
select tmp, resi 93-94
color br7, tmp
select tmp, resi 95-95
color br8, tmp
select tmp, resi 96-96
color br5, tmp
select tmp, resi 97-97
color br8, tmp
select tmp, resi 98-98
color br7, tmp
select tmp, resi 99-99
color br8, tmp
select tmp, resi 100-100
color br6, tmp
select tmp, resi 101-101
color br8, tmp
select tmp, resi 102-102
color br9, tmp
select tmp, resi 103-103
color br8, tmp
select tmp, resi 104-104
color br6, tmp
select tmp, resi 105-105
color br9, tmp
select tmp, resi 106-106
color br6, tmp
select tmp, resi 107-107
color br7, tmp
select tmp, resi 108-108
color br6, tmp
select tmp, resi 109-109
color br9, tmp
select tmp, resi 110-110
color br6, tmp
select tmp, resi 111-111
color br7, tmp
select tmp, resi 112-112
color br6, tmp
select tmp, resi 113-113
color br9, tmp
select tmp, resi 114-114
color br8, tmp
select tmp, resi 115-115
color br6, tmp
select tmp, resi 116-117
color br9, tmp
select tmp, resi 118-118
color br8, tmp
select tmp, resi 119-119
color br9, tmp
select tmp, resi 120-120
color br5, tmp
select tmp, resi 121-121
color br9, tmp
select tmp, resi 122-122
color br6, tmp
select tmp, resi 123-125
color br9, tmp
select tmp, resi 126-126
color br6, tmp
select tmp, resi 127-129
color br8, tmp
select tmp, resi 130-130
color br7, tmp
select tmp, resi 131-131
color br6, tmp
select tmp, resi 132-132
color br8, tmp
select tmp, resi 133-134
color br9, tmp
select tmp, resi 135-135
color br5, tmp
select tmp, resi 136-136
color br6, tmp
select tmp, resi 137-139
color br9, tmp
select tmp, resi 140-140
color br8, tmp
select tmp, resi 141-141
color br6, tmp
select tmp, resi 142-142
color br7, tmp
select tmp, resi 143-143
color br6, tmp
select tmp, resi 144-144
color br7, tmp
select tmp, resi 145-145
color br5, tmp
select tmp, resi 146-146
color br9, tmp
select tmp, resi 147-148
color br8, tmp
select tmp, resi 149-149
color br9, tmp
select tmp, resi 150-151
color br7, tmp
select tmp, resi 152-152
color br4, tmp
select tmp, resi 153-153
color br6, tmp
select tmp, resi 154-154
color br7, tmp
select tmp, resi 155-155
color br8, tmp
select tmp, resi 156-156
color br9, tmp
select tmp, resi 157-157
color br6, tmp
select tmp, resi 158-158
color br8, tmp
select tmp, resi 159-159
color br4, tmp
select tmp, resi 160-160
color br7, tmp
select tmp, resi 161-161
color br8, tmp
select tmp, resi 162-162
color br5, tmp
select tmp, resi 163-163
color br4, tmp
select tmp, resi 164-164
color br8, tmp
select tmp, resi 165-165
color br7, tmp
select tmp, resi 166-166
color br8, tmp
select tmp, resi 167-167
color br9, tmp
select tmp, resi 168-169
color br7, tmp
select tmp, resi 170-170
color br9, tmp
select tmp, resi 171-171
color br8, tmp
select tmp, resi 172-174
color br9, tmp
select tmp, resi 175-175
color br4, tmp
select tmp, resi 176-176
color br7, tmp
select tmp, resi 177-177
color br9, tmp
select tmp, resi 178-178
color br4, tmp
select tmp, resi 179-179
color br9, tmp
select tmp, resi 180-180
color br8, tmp
select tmp, resi 181-181
color br7, tmp
select tmp, resi 182-183
color br4, tmp
select tmp, resi 184-184
color br9, tmp
select tmp, resi 185-185
color br4, tmp
select tmp, resi 186-186
color br6, tmp
select tmp, resi 187-187
color br7, tmp
select tmp, resi 188-188
color br9, tmp
select tmp, resi 189-189
color br8, tmp
select tmp, resi 190-190
color br9, tmp
select tmp, resi 191-192
color br6, tmp
select tmp, resi 193-193
color br8, tmp
select tmp, resi 194-194
color br5, tmp
select tmp, resi 195-195
color br6, tmp
select tmp, resi 196-196
color br8, tmp
select tmp, resi 197-197
color br7, tmp
select tmp, resi 198-198
color br8, tmp
select tmp, resi 199-199
color br6, tmp
select tmp, resi 200-200
color br8, tmp
select tmp, resi 201-201
color br9, tmp
select tmp, resi 202-202
color br6, tmp
select tmp, resi 203-203
color br7, tmp
select tmp, resi 204-204
color br6, tmp
select tmp, resi 205-205
color br7, tmp
select tmp, resi 206-206
color br9, tmp
select tmp, resi 207-208
color br0, tmp
select none
